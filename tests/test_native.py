"""Native C++ loader tests (decode + Lanczos resize + triple augmentation).

Skipped when the toolchain/libjpeg/libpng are unavailable — the Python/cv2
pipeline covers the same contract (test_data.py).
"""

import os

import numpy as np
import pytest
from PIL import Image

from lcgan_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native loader not buildable")


@pytest.fixture
def png_path(tmp_path, rng):
    p = tmp_path / "img.png"
    Image.fromarray(rng.integers(0, 255, (48, 40, 3), dtype=np.uint8)).save(p)
    return str(p)


@pytest.fixture
def jpg_path(tmp_path, rng):
    p = tmp_path / "img.jpg"
    Image.fromarray(rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)).save(p, quality=95)
    return str(p)


def test_triple_shapes_and_determinism(png_path):
    a = native.load_triple(png_path, 32, 777)
    b = native.load_triple(png_path, 32, 777)
    for x, y in zip(a, b):
        assert x.shape == (32, 32, 3) and x.dtype == np.uint8
        np.testing.assert_array_equal(x, y)
    # different seed -> different augmentation
    c = native.load_triple(png_path, 32, 778)
    assert not np.array_equal(a[1], c[1]) or not np.array_equal(a[2], c[2])


def test_jpeg_and_png_decode_match_pil(jpg_path, png_path):
    for p in (jpg_path, png_path):
        ours = native.load_image(p, 32)
        pil = np.asarray(Image.open(p).convert("RGB").resize((32, 32), Image.LANCZOS))
        # same kernel family; implementations differ in edge handling by <= a few LSB
        assert ours.shape == pil.shape
        diff = np.abs(ours.astype(int) - pil.astype(int))
        assert np.mean(diff) < 3.0
        assert np.percentile(diff, 99) <= 12


def test_identity_size_passthrough(tmp_path, rng):
    arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    p = tmp_path / "exact.png"
    Image.fromarray(arr).save(p)
    out = native.load_image(str(p), 32)
    np.testing.assert_array_equal(out, arr)


def test_batch_parallel_matches_serial(png_path, jpg_path):
    paths = [png_path, jpg_path, png_path, jpg_path]
    seeds = [1, 2, 3, 4]
    img, geo, app, failed = native.load_batch(paths, 32, seeds, num_threads=3)
    assert not failed.any()
    for i, (p, s) in enumerate(zip(paths, seeds)):
        si, sg, sa = native.load_triple(p, 32, s)
        np.testing.assert_array_equal(img[i], si)
        np.testing.assert_array_equal(geo[i], sg)
        np.testing.assert_array_equal(app[i], sa)


def test_bad_path_reports_failure(tmp_path, png_path):
    # per-sample mask: the bad slot is flagged, the good slot still decodes
    paths = [str(tmp_path / "missing.jpg"), png_path]
    img, geo, app, failed = native.load_batch(paths, 16, [0, 1])
    assert failed.tolist() == [True, False]
    ref, _, _ = native.load_triple(png_path, 16, 1)
    np.testing.assert_array_equal(img[1], ref)


def test_pipeline_per_sample_fallback(tmp_path):
    """One non-JPEG/PNG file (PIL handles it, the C++ decoder does not) must
    fall back for THAT sample only — the native path stays enabled and the
    batch is fully valid (the old behavior disabled native forever)."""
    from PIL import Image

    from lcgan_tpu.data.dataset import ImageFolderDataset, TrainInputPipeline

    d = tmp_path / "ds" / "train" / "x"
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(d / f"{i}.png")
    Image.fromarray(rng.integers(0, 255, (20, 20, 3), dtype=np.uint8)).save(d / "3.bmp")

    ds = ImageFolderDataset(str(tmp_path / "ds"), 16, is_train=True, seed=0)
    pipe = TrainInputPipeline(ds, batch_size=4, num_workers=1, seed=0)
    assert pipe.use_native
    batch = next(iter(pipe))
    assert pipe.use_native  # still on after the .bmp
    for k in ("image", "geometry_change", "appearance_change"):
        assert batch[k].shape == (4, 16, 16, 3)
        assert np.isfinite(batch[k]).all()
        assert batch[k].min() >= -1.0 and batch[k].max() <= 1.0


def test_native_perspective_albumentations_semantics(tmp_path):
    """The C++ geometry view mirrors augment.py's albumentations semantics:
    crop-zoom draws keep a white image all white; fit-output draws introduce
    black wedges. Both variants occur."""
    from PIL import Image

    p = str(tmp_path / "white.png")
    Image.fromarray(np.full((64, 64, 3), 255, np.uint8)).save(p)
    borderless = expanded = 0
    for seed in range(24):
        _, geo, _ = native.load_triple(p, 64, seed)
        if (geo == 255).all():  # crop-zoom of a white interior stays white
            borderless += 1
        elif (geo < 128).any():  # a dark wedge survived the keep_size blur
            expanded += 1
    assert borderless > 0, "no crop-zoom (fit_output=False) draws"
    assert expanded > 0, "no expanded (fit_output=True) draws"
