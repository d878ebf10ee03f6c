"""Triple-view augmentations (custom_dataset.py:19-49), numpy/cv2 host ops.

The reference composes albumentations transforms; albumentations is not a
dependency here, so the same transform families are implemented directly on
numpy arrays (cv2 does the heavy lifting in C++ and releases the GIL):

  * geometry view  = random Perspective, two variants — fit_output=True
    (whole warped quad fits the frame, then resized back) and
    fit_output=False (warp in place), p=0.5 each
    (custom_dataset.py:22-23,27-33)
  * appearance view = CoarseDropout (1 hole, 30–50% of each side) OR
    ColorJitter (brightness/contrast/saturation/hue = 0.2, torchvision
    semantics, random order), p=0.5 each (custom_dataset.py:19-24,35-49)

Distributional note: albumentations' Perspective draws corner offsets from
N(0, scale) with scale ~ U(0.05, 0.1) of the side length; this module draws
the same way. Exact per-sample parity with albumentations is neither needed
nor testable (the reference trains on random draws); the transform family
and magnitudes match.

All functions take uint8 RGB HWC arrays and a ``numpy.random.Generator``.
"""

from __future__ import annotations

import cv2
import numpy as np


# ----------------------------------------------------------------------
# geometry view
# ----------------------------------------------------------------------
def random_perspective(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Random 4-corner perspective warp, scale ~ U(0.05, 0.1)."""
    fit_output = bool(rng.random() < 0.5)  # variant 1 vs 2 (p=0.5 each)
    h, w = img.shape[:2]
    scale = rng.uniform(0.05, 0.1)
    jitter = rng.normal(0.0, scale, (4, 2)).astype(np.float32)
    jitter = np.clip(jitter, -0.3, 0.3)
    src = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float32)
    dst = src + jitter * np.array([w, h], np.float32)

    if fit_output:
        # translate/scale so the full warped quad lands inside the frame,
        # then keep_size (already same size here)
        mn = dst.min(axis=0)
        mx = dst.max(axis=0)
        dst = (dst - mn) / np.maximum(mx - mn, 1e-6) * np.array([w, h], np.float32)
    m = cv2.getPerspectiveTransform(src, dst)
    return cv2.warpPerspective(img, m, (w, h), flags=cv2.INTER_LINEAR, borderValue=0)


# ----------------------------------------------------------------------
# appearance view
# ----------------------------------------------------------------------
def coarse_dropout(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """One black hole covering 30–50% of each side (custom_dataset.py:24)."""
    h, w = img.shape[:2]
    hole_h = int(rng.uniform(0.3, 0.5) * h)
    hole_w = int(rng.uniform(0.3, 0.5) * w)
    y = int(rng.integers(0, max(h - hole_h, 1)))
    x = int(rng.integers(0, max(w - hole_w, 1)))
    out = img.copy()
    out[y : y + hole_h, x : x + hole_w] = 0
    return out


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    out = a.astype(np.float32) * factor + b.astype(np.float32) * (1.0 - factor)
    return np.clip(out, 0, 255).astype(np.uint8)


def color_jitter(img: np.ndarray, rng: np.random.Generator, strength: float = 0.2) -> np.ndarray:
    """torchvision-style ColorJitter(b=c=s=h=0.2), ops in random order."""
    ops = list(rng.permutation(4))
    out = img
    for op in ops:
        if op == 0:  # brightness
            f = rng.uniform(1 - strength, 1 + strength)
            out = np.clip(out.astype(np.float32) * f, 0, 255).astype(np.uint8)
        elif op == 1:  # contrast: blend with mean gray
            f = rng.uniform(1 - strength, 1 + strength)
            gray = cv2.cvtColor(out, cv2.COLOR_RGB2GRAY)
            mean = np.full_like(out, int(round(gray.mean())))
            out = _blend(out, mean, f)
        elif op == 2:  # saturation: blend with per-pixel gray
            f = rng.uniform(1 - strength, 1 + strength)
            gray = cv2.cvtColor(out, cv2.COLOR_RGB2GRAY)[..., None].repeat(3, axis=2)
            out = _blend(out, gray, f)
        else:  # hue shift in [-0.2, 0.2] of the wheel
            f = rng.uniform(-strength, strength)
            hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)
            # cv2 uint8 hue range is [0,180)
            hsv[..., 0] = (hsv[..., 0].astype(np.int32) + int(round(f * 180))) % 180
            out = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
    return out


def random_appearance_transform(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """CoarseDropout or ColorJitter, p=0.5 each (custom_dataset.py:35-41)."""
    if rng.random() < 0.5:
        return coarse_dropout(img, rng)
    return color_jitter(img, rng)


def random_geometry_transform(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    return random_perspective(img, rng)


def to_model_range(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1], clamped (custom_dataset.py:81-86)."""
    out = img.astype(np.float32) / 255.0 * 2.0 - 1.0
    return np.clip(out, -1.0, 1.0)
