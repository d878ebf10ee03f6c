"""Generation phases: fake images, control-dim demo videos, train monitors
(worker.py:255-363, 427-441, 447-485).

Fixes over the reference, per SURVEY.md §7:
  * generation runs once (process 0), not redundantly on every rank racing
    on the same filenames (loader.py:95-110)
  * the appearance monitor sweeps appearance dims (the reference swaps
    geo/app dims at worker.py:316-318, benign only because both are 64)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.config import Config
from lcgan_tpu.utils.media import make_grid, resize_frame, save_image_grid, save_video, to_uint8


def _to_unit(img: jax.Array) -> np.ndarray:
    """[-1,1] model output -> float [0,1] numpy (worker.py:435)."""
    return np.asarray(jnp.clip((img.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0))


def fake_image_generation(cfg: Config, trainer, state, rng_key: Optional[jax.Array] = None):
    """num_fakes batches → <model_name>/fakes/NNNN_images.jpg (worker.py:427-441)."""
    key = rng_key if rng_key is not None else jax.random.PRNGKey(cfg.seed)
    folder = cfg.run_dirs()["fakes"]
    os.makedirs(folder, exist_ok=True)
    local_b = max(cfg.batch_size // jax.device_count(), 1)
    for count in range(cfg.num_fakes):
        key, k1, k2 = jax.random.split(key, 3)
        z1 = jax.random.normal(k1, (local_b, cfg.geo_noise_dim))
        z2 = jax.random.normal(k2, (local_b, cfg.app_noise_dim))
        imgs = _to_unit(trainer.generate(state, z1, z2, w_psi=cfg.w_psi))
        save_image_grid(imgs, os.path.join(folder, f"{count:04d}_images.jpg"), nrow=1, padding=0)


def demo_generation(
    cfg: Config,
    trainer,
    state,
    controlled_dim: int = 0,
    num_video: int = 1,
    num_explore: int = 30,
    num_repeat: int = 1,
    rng_key: Optional[jax.Array] = None,
):
    """Sweep one latent dim −psi→+psi→−psi over num_explore steps each way;
    mp4 per video (worker.py:447-485).

    Parity note: the endpoint arithmetic deliberately reproduces the
    reference's (worker.py:456-472): the code starts at −psi − interval and
    increments BEFORE rendering, so the up-pass tops out at +psi − interval
    (never exactly +psi) and the down-pass's final frame sits at
    −psi − interval, one step out of range. The monitor sweep
    (monitor_current_result) interpolates and hits both endpoints — that
    asymmetry is the reference's, not an accident here."""
    key = rng_key if rng_key is not None else jax.random.PRNGKey(cfg.seed)
    folder = cfg.run_dirs()["demo"]
    os.makedirs(folder, exist_ok=True)
    local_b = max(cfg.batch_size // jax.device_count(), 1)
    total_dim = cfg.geo_noise_dim + cfg.app_noise_dim
    nrow = max(int(local_b**0.5), 1)

    for n in range(num_video):
        key, k = jax.random.split(key)
        latent = np.array(jax.random.normal(k, (local_b, total_dim)), np.float32)  # writable copy
        interval = cfg.psi * 2.0 / num_explore
        latent[:, controlled_dim] = -cfg.psi - interval
        frames = []
        for direction in (+1.0, -1.0):
            for _ in range(num_explore):
                latent[:, controlled_dim] += direction * interval
                z1 = jnp.asarray(latent[:, : cfg.geo_noise_dim])
                z2 = jnp.asarray(latent[:, cfg.geo_noise_dim :])
                img = _to_unit(trainer.generate(state, z1, z2, w_psi=cfg.w_psi))
                frames.append(to_uint8(make_grid(img, nrow=nrow, padding=0)))
        frames = frames * num_repeat
        save_video(
            frames,
            os.path.join(folder, f"controlled_dim={controlled_dim}_{n}.mp4"),
            fps=num_explore,
        )


def monitor_current_result(
    cfg: Config,
    trainer,
    state,
    epoch: int = 0,
    num_explore: int = 10,
    w_psi: float = 0.7,
    nrow: int = 8,
    images_per_output: int = 32,
    num_clips: int = 5,
    rng_key: Optional[jax.Array] = None,
    disp_resolution: int = 128,
):
    """Per-dim sweep mp4s with the EMA generator (worker.py:255-363).

    For each group of ``images_per_output`` dims, render ``num_clips`` clips;
    each clip sweeps sample j's dim (group*ipo + j) from -psi to +psi and
    back, with a fresh appearance code per clip.
    """
    key = rng_key if rng_key is not None else jax.random.PRNGKey(cfg.seed + epoch)
    samples_dir = cfg.run_dirs()["samples"]
    os.makedirs(samples_dir, exist_ok=True)

    def sweep(noise_dim_swept: int, other_dim: int, swept_is_geo: bool, tag: str):
        ipo = min(images_per_output, noise_dim_swept)
        for group in range(noise_dim_swept // ipo):
            nonlocal key
            mult_frames = []
            for _ in range(num_clips):
                key, ka, kb = jax.random.split(key, 3)
                start = np.array(jax.random.normal(ka, (ipo, noise_dim_swept)), np.float32)
                end = start.copy()
                other = jax.random.normal(kb, (ipo, other_dim))
                for j in range(ipo):
                    idx = group * ipo + j
                    start[j, idx] = -cfg.psi
                    end[j, idx] = cfg.psi
                frames = []
                for seq_start, seq_end in ((start, end), (end, start)):
                    for j in range(num_explore):
                        t = j / num_explore
                        inter = seq_start + (seq_end - seq_start) * t
                        z = jnp.asarray(inter)
                        if swept_is_geo:
                            img = trainer.generate(state, z, other, w_psi=w_psi)
                        else:
                            img = trainer.generate(state, other, z, w_psi=w_psi)
                        canvas = make_grid(_to_unit(img), nrow=nrow, padding=0)
                        frames.append(
                            resize_frame(
                                canvas,
                                (disp_resolution * ipo // nrow, disp_resolution * nrow),
                            )
                        )
                mult_frames.extend(frames * 2)  # worker.py:307
            save_video(
                mult_frames,
                os.path.join(samples_dir, f"{tag}_{epoch}_{group}.mp4"),
                fps=15,
            )

    sweep(cfg.geo_noise_dim, cfg.app_noise_dim, True, "geometry")
    sweep(cfg.app_noise_dim, cfg.geo_noise_dim, False, "appearance")
