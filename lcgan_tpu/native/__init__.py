"""ctypes bindings for the native C++ input pipeline (loader.cpp).

Builds the shared library on first use (g++, ~2s) and caches it next to the
source. Falls back gracefully: ``available()`` is False if the toolchain or
libjpeg/libpng are missing, and the Python/cv2 pipeline is used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_LIB = os.path.join(_HERE, "liblcgan_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB,
        "-ljpeg", "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.lcg_load_triple.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_uint64, u8p, u8p, u8p,
        ]
        lib.lcg_load_triple.restype = ctypes.c_int
        lib.lcg_load_image.argtypes = [ctypes.c_char_p, ctypes.c_int, u8p]
        lib.lcg_load_image.restype = ctypes.c_int
        lib.lcg_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64), u8p, u8p, u8p, ctypes.c_int,
        ]
        lib.lcg_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def load_triple(path: str, size: int, seed: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    assert lib is not None
    img = np.empty((size, size, 3), np.uint8)
    geo = np.empty((size, size, 3), np.uint8)
    app = np.empty((size, size, 3), np.uint8)
    rc = lib.lcg_load_triple(path.encode(), size, seed & (2**64 - 1), _u8p(img), _u8p(geo), _u8p(app))
    if rc:
        raise IOError(f"native decode failed: {path}")
    return img, geo, app


def load_image(path: str, size: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    img = np.empty((size, size, 3), np.uint8)
    if lib.lcg_load_image(path.encode(), size, _u8p(img)):
        raise IOError(f"native decode failed: {path}")
    return img


def load_batch(
    paths: List[str], size: int, seeds: List[int], num_threads: int = 4
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Returns (image, geo, app, n_failures); arrays are (N,size,size,3) u8."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    img = np.empty((n, size, size, 3), np.uint8)
    geo = np.empty((n, size, size, 3), np.uint8)
    app = np.empty((n, size, size, 3), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_seeds = (ctypes.c_uint64 * n)(*[s & (2**64 - 1) for s in seeds])
    failures = lib.lcg_load_batch(
        c_paths, n, size, c_seeds, _u8p(img), _u8p(geo), _u8p(app), num_threads
    )
    return img, geo, app, failures
