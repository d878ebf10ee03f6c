"""Measure what freezeD's stop_gradient form actually saves on-chip.

The reference's `requires_grad=False` (worker.py:127-135) makes autograd
skip the frozen early D blocks' backward — the expensive high-resolution
ones (freezeD layer 5 of 8 in every 1024² recipe, README.md:27-33). The
rebuild's post-freeze variants stop_gradient the frozen param leaves
(train/steps.py) so XLA DCEs the same work. This probe times full train
iterations (odd = adv-only, the common case) pre-freeze vs post-freeze,
and post-freeze with the stop_gradient path disabled (grad-mask oracle,
which keeps the dead backward).

Usage: python -m tools.freeze_bench_probe [--res 1024] [--batch 2] [--layer 5]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.config import Config
from lcgan_tpu.train.steps import Trainer


def time_iter(trainer, state, batch, epoch, n=8):
    state2, g, d = trainer.train_iteration(state, batch, epoch)
    float(g), float(d)
    t0 = time.perf_counter()
    s = state
    for _ in range(n):
        s, g, d = trainer.train_iteration(s, batch, epoch)
    float(g), float(d)  # value barrier (axon block_until_ready unreliable)
    return (time.perf_counter() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--layer", type=int, default=5)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass

    rng = np.random.default_rng(0)
    b = args.batch
    img = rng.uniform(-1, 1, (b, args.res, args.res, 3)).astype(np.float32)
    batch = {
        "image": jnp.asarray(img),
        "geometry_change": jnp.asarray(img),
        "appearance_change": jnp.asarray(img),
    }

    def make(freeze_start, stop_gradient=True):
        cfg = Config(
            model_name="/tmp/lcgan_freeze_bench",
            img_resolution=args.res,
            batch_size=b,
            compute_dtype="bfloat16",
            remat_blocks=True,
            freezeD_start=freeze_start,
            freezeD_layer=args.layer,
        )
        tr = Trainer(cfg, mesh=None)
        tr._freeze_stop_gradient = stop_gradient
        return tr, tr.init_state()

    print(f"res={args.res} b={b} freezeD_layer={args.layer} (odd iteration)", flush=True)
    for name, start, sg in (
        ("pre-freeze           ", 10**9, True),
        ("frozen, stop_gradient", 0, True),
        ("frozen, grad-mask    ", 0, False),
    ):
        tr, st = make(start, sg)
        ms = time_iter(tr, st, batch, epoch=3)  # odd, no R1
        print(f"{name}: {ms:8.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
