"""FID evaluation (worker.py:381-425, eval/fid.py:4-27).

Protocol parity: up to 50k real (train-split) images vs an equal number of
EMA-generated images at cfg.w_psi; pool3 2048-d features; Fréchet distance
via scipy sqrtm (fp64).

Fix over the reference (SURVEY.md §3.2): features are gathered across all
processes before computing mean/cov — the reference computes per-shard FID
with no cross-rank gather (worker.py:390-418).
"""

from __future__ import annotations

import math
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from lcgan_tpu.config import Config
from lcgan_tpu.data.dataset import ImageFolderDataset, Prefetcher
from lcgan_tpu.eval.inception import InceptionV3FID


def calc_fid(sample_mean, sample_cov, real_mean, real_cov, eps: float = 1e-6) -> float:
    """Fréchet distance ||m1-m2||² + Tr(C1 + C2 - 2·(C1 C2)^{1/2})."""
    cov_sqrt = linalg.sqrtm(sample_cov @ real_cov)
    if not np.isfinite(cov_sqrt).all():
        offset = np.eye(sample_cov.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sample_cov + offset) @ (real_cov + offset))
    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            raise ValueError(f"Imaginary component {np.max(np.abs(cov_sqrt.imag))}")
        cov_sqrt = cov_sqrt.real
    mean_diff = sample_mean - real_mean
    return float(
        mean_diff @ mean_diff
        + np.trace(sample_cov) + np.trace(real_cov) - 2 * np.trace(cov_sqrt)
    )


def load_inception_params(cfg: Config, model: InceptionV3FID):
    """Pretrained params if provided (+auto-convert .pth), else random init
    (random weights make FID meaningless but keep the phase runnable in CI)."""
    path = cfg.inception_weights
    if path:
        if path.endswith(".pth"):
            from lcgan_tpu.eval.convert import convert_torch_inception

            params = convert_torch_inception(path)
        else:
            from lcgan_tpu.eval.convert import load_params_npz

            params = load_params_npz(path)
        return jax.tree.map(jnp.asarray, {"params": params})
    print(
        "WARNING: --inception_weights not set; using RANDOM Inception weights. "
        "The resulting FID is not comparable to the reference protocol."
    )
    dummy = jnp.zeros((1, 299, 299, 3))
    return InceptionV3FID().init(jax.random.PRNGKey(0), dummy)


def fid_real_indices(
    dataset_len: int, num_batches: int, local_b: int, seed: int,
    process_index: int = 0, process_count: int = 1,
) -> np.ndarray:
    """This process's real-image indices: a seeded permutation of the dataset,
    truncated to the batch geometry — sampling WITHOUT replacement (the
    reference draws reals through its shuffled training sampler,
    worker.py:385-399; the old modulo wrap silently duplicated images)."""
    take = num_batches * local_b * process_count
    if take > dataset_len:
        raise ValueError(
            f"FID batch geometry needs {take} unique reals but the dataset has {dataset_len}"
        )
    perm = np.random.default_rng(seed).permutation(dataset_len)[:take]
    return perm[process_index::process_count]


def fid_evaluate(cfg: Config, trainer, state, num_images: Optional[int] = None) -> float:
    # The FID protocol is fp32 (pytorch-fid runs Inception in fp32): the
    # metric must not move with the --compute_dtype training knob, or best-FID
    # tracking compares numbers from different precisions.
    inception = InceptionV3FID(dtype=jnp.float32)
    inc_vars = load_inception_params(cfg, inception)

    # weights passed as an ARGUMENT, not a closure: baked-in ~95MB constants
    # hit remote-compile body limits on tunneled backends
    mesh = trainer.mesh
    if mesh is not None:
        # feature extraction sharded over the data axis (r2 weak #4: one chip
        # worked while the rest idled); images are PROCESS-LOCAL rows
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lcgan_tpu.train.steps import _local_shard_data

        sharding = NamedSharding(mesh, P("data"))
        # replicate the ~95MB weights onto the mesh ONCE — left committed to
        # the default device they would be re-broadcast on every dispatch
        inc_vars = jax.device_put(inc_vars, NamedSharding(mesh, P()))
        feat_sharded = jax.jit(
            lambda v, imgs: inception.apply(v, imgs), out_shardings=sharding
        )

        def features(imgs_np):
            imgs_np = np.asarray(imgs_np)
            b = imgs_np.shape[0]
            pad = (-b) % jax.local_device_count()
            if pad:
                imgs_np = np.concatenate(
                    [imgs_np, np.zeros((pad,) + imgs_np.shape[1:], imgs_np.dtype)]
                )
            garr = jax.make_array_from_process_local_data(sharding, imgs_np)
            return _local_shard_data(feat_sharded(inc_vars, garr))[:b]

    else:
        feat_fn = jax.jit(lambda v, imgs: inception.apply(v, imgs))

        def features(imgs_np):
            return np.asarray(feat_fn(inc_vars, jnp.asarray(imgs_np)))

    dataset = ImageFolderDataset(cfg.dataset_path, cfg.img_resolution, is_train=False, seed=cfg.seed)
    n = min(len(dataset), 50000 if num_images is None else num_images)
    local_b = max(cfg.batch_size // jax.process_count(), 1)
    num_batches = int(math.floor(n / cfg.batch_size)) if cfg.batch_size <= n else 1
    if cfg.batch_size > n:  # tiny dataset: shrink the batch, never duplicate
        local_b = max(n // jax.process_count(), 1)

    # ---- real features: decode on a thread pool, prefetch ahead of the TPU
    # (the reference decodes serially on the main thread — hours at 1024²) ----
    pi, pc = jax.process_index(), jax.process_count()
    idxs = fid_real_indices(len(dataset), num_batches, local_b, cfg.seed, pi, pc)
    pool = ThreadPoolExecutor(max_workers=max(1, cfg.num_data_workers))

    def real_batches():
        for b in range(num_batches):
            chunk = idxs[b * local_b : (b + 1) * local_b]
            imgs = list(pool.map(lambda i: dataset.get_eval(int(i))[0], chunk))
            yield np.stack(imgs)

    real_feats = []
    for imgs in Prefetcher(real_batches(), depth=2):
        real_feats.append(features(imgs))
    pool.shutdown(wait=False)

    # ---- generated features (sharded across the mesh when present) ----
    key = jax.random.PRNGKey(cfg.seed + 1 + pi)
    gen_feats = []
    for _ in range(num_batches):
        key, k1, k2 = jax.random.split(key, 3)
        z1 = jax.random.normal(k1, (local_b, cfg.geo_noise_dim))
        z2 = jax.random.normal(k2, (local_b, cfg.app_noise_dim))
        fake = trainer.generate_sharded(state, z1, z2, w_psi=cfg.w_psi)
        gen_feats.append(features(fake))

    real = np.concatenate(real_feats, 0).astype(np.float64)
    gen = np.concatenate(gen_feats, 0).astype(np.float64)

    if pc > 1:  # cross-process gather (the reference never gathers)
        from jax.experimental import multihost_utils

        real = np.asarray(multihost_utils.process_allgather(real)).reshape(-1, real.shape[-1])
        gen = np.asarray(multihost_utils.process_allgather(gen)).reshape(-1, gen.shape[-1])

    fid_value = calc_fid(
        gen.mean(0), np.cov(gen, rowvar=False), real.mean(0), np.cov(real, rowvar=False)
    )
    if jax.process_index() == 0:
        print("fid_value:", fid_value)
    return fid_value
