"""Media writers and checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.utils.checkpoint import CheckpointManager, read_epoch_file, write_epoch_file
from lcgan_tpu.utils.media import make_grid, save_image_grid, save_video, to_uint8


def test_make_grid_matches_torchvision_layout(rng):
    import torch

    imgs = rng.random((5, 4, 6, 3), dtype=np.float32)
    grid = make_grid(imgs, nrow=2, padding=0)
    # torchvision reference layout
    from math import ceil

    assert grid.shape == (ceil(5 / 2) * 4, 2 * 6, 3)
    np.testing.assert_array_equal(grid[:4, :6], imgs[0])
    np.testing.assert_array_equal(grid[:4, 6:12], imgs[1])
    np.testing.assert_array_equal(grid[4:8, :6], imgs[2])
    # empty cell zero-filled
    np.testing.assert_array_equal(grid[8:, 6:], 0)


def test_save_image_and_video(tmp_path, rng):
    imgs = rng.random((4, 8, 8, 3), dtype=np.float32)
    p = tmp_path / "grid.jpg"
    save_image_grid(imgs, str(p), nrow=2)
    assert p.exists() and p.stat().st_size > 0

    frames = [to_uint8(rng.random((16, 16, 3), dtype=np.float32)) for _ in range(5)]
    v = tmp_path / "clip.mp4"
    save_video(frames, str(v), fps=5)
    assert (v.exists() and v.stat().st_size > 0) or (tmp_path / "clip.gif").exists()


def test_checkpoint_roundtrip(tmp_path):
    from lcgan_tpu.config import Config
    from lcgan_tpu.train.state import create_train_state

    cfg = Config(
        model_name=str(tmp_path / "run"),
        img_resolution=16,
        batch_size=4,
        geo_noise_dim=8,
        app_noise_dim=8,
        geo_latent_dim=8,
        app_latent_dim=16,
        geo_projection_dim=8,
        app_projection_dim=8,
        base_nf=8,
        max_nf=16,
        compute_dtype="float32",
    )
    state = create_train_state(cfg)
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    mgr = CheckpointManager(str(tmp_path / "run" / "model"))
    mgr.save(state)
    assert mgr.exists()

    fresh = create_train_state(cfg, seed=999)
    restored = mgr.restore(fresh)
    assert int(restored.step) == 42
    np.testing.assert_array_equal(
        np.asarray(restored.g_params["const"]), np.asarray(state.g_params["const"])
    )
    # optimizer + rng state round-trips (more than the reference saves)
    np.testing.assert_array_equal(np.asarray(restored.rng), np.asarray(state.rng))

    write_epoch_file(cfg.model_name, 42)
    assert read_epoch_file(cfg.model_name) == 42
