"""Data pipeline tests: folder scan, triple views, sharding semantics."""

import os

import numpy as np
import pytest
from PIL import Image

from lcgan_tpu.data import augment
from lcgan_tpu.data.dataset import ImageFolderDataset, Prefetcher, TrainInputPipeline


@pytest.fixture
def image_dir(tmp_path):
    root = tmp_path / "ds" / "train" / "class_a"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(12):
        arr = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i:03d}.png")
    return str(tmp_path / "ds")


def test_dataset_scan_and_train_triple(image_dir):
    ds = ImageFolderDataset(image_dir, resized_size=32, is_train=True)
    assert len(ds) == 12
    rng = np.random.default_rng(1)
    img, geo, app = ds.get_train(0, rng)
    for arr in (img, geo, app):
        assert arr.shape == (32, 32, 3)
        assert arr.dtype == np.float32
        assert arr.min() >= -1.0 and arr.max() <= 1.0
    # views differ from the base image
    assert not np.array_equal(img, geo)
    assert not np.array_equal(img, app)


def test_dataset_eval_mode(image_dir):
    ds = ImageFolderDataset(image_dir, resized_size=32, is_train=False)
    img, label = ds.get_eval(3)
    assert img.shape == (32, 32, 3)
    assert label == 0


def test_pipeline_batches_and_sharding(image_dir):
    ds = ImageFolderDataset(image_dir, resized_size=16, is_train=True)
    pipe = TrainInputPipeline(ds, batch_size=4, process_index=0, process_count=2, num_workers=2)
    batch = next(pipe)
    assert set(batch) == {"image", "geometry_change", "appearance_change"}
    assert batch["image"].shape == (2, 16, 16, 3)  # host shard of global batch

    # two ranks see disjoint shards in an epoch
    pipe0 = TrainInputPipeline(ds, 4, 0, 2, num_workers=1, seed=7)
    pipe1 = TrainInputPipeline(ds, 4, 1, 2, num_workers=1, seed=7)
    i0 = pipe0._epoch_indices()
    i1 = pipe1._epoch_indices()
    assert set(i0).isdisjoint(set(i1))
    assert len(i0) == len(i1) == 6


def test_pipeline_deterministic_given_seed(image_dir):
    ds = ImageFolderDataset(image_dir, resized_size=16, is_train=True)
    b1 = next(TrainInputPipeline(ds, 4, 0, 1, num_workers=1, seed=3))
    b2 = next(TrainInputPipeline(ds, 4, 0, 1, num_workers=1, seed=3))
    np.testing.assert_array_equal(b1["image"], b2["image"])
    np.testing.assert_array_equal(b1["geometry_change"], b2["geometry_change"])


def test_prefetcher_passthrough():
    items = list(Prefetcher(iter(range(5)), depth=2))
    assert items == [0, 1, 2, 3, 4]


def test_augment_families(rng):
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    g = np.random.default_rng(0)
    warped = augment.random_perspective(img, g)
    assert warped.shape == img.shape and warped.dtype == np.uint8

    dropped = augment.coarse_dropout(img, np.random.default_rng(1))
    # exactly one black hole of 30-50% per side
    hole = np.all(dropped == 0, axis=2)
    frac = hole.mean()
    assert 0.3 * 0.3 <= frac <= 0.5 * 0.5 + 0.05

    jittered = augment.color_jitter(img, np.random.default_rng(2))
    assert jittered.shape == img.shape
    assert not np.array_equal(jittered, img)

    unit = augment.to_model_range(img)
    np.testing.assert_allclose(unit, img.astype(np.float32) / 255 * 2 - 1, atol=1e-6)


def test_perspective_albumentations_semantics(rng):
    """albumentations maps an inward-jittered quad TO the output rect:
    fit_output=False draws are border-free crop-zooms (a white image stays
    all white), fit_output=True draws expand the frame (black wedges).
    Both variants must occur at p=0.5 each (custom_dataset.py:22-33)."""
    white = np.full((64, 64, 3), 255, np.uint8)
    borderless = expanded = 0
    for seed in range(24):
        out = augment.random_perspective(white, np.random.default_rng(seed))
        assert out.shape == white.shape
        if (out == 255).all():  # crop-zoom of a white interior stays white
            borderless += 1
        elif (out < 128).any():  # a dark wedge survived the keep_size blur
            expanded += 1
        # (tiny-jitter fit-output draws blur their wedge to mid-gray and
        # land in neither bucket — the partition is not exhaustive)
    assert borderless > 0, "no crop-zoom (fit_output=False) draws"
    assert expanded > 0, "no expanded (fit_output=True) draws"
