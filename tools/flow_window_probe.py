"""Probe: how much smaller could the warp band be with flow-adaptive windows?

The fused warp kernel prices every band sweep for the WORST-CASE displacement
M = ceil(0.5 + max_flow_scale·size/2 + 2) (tanh bound, ops/grid_sample.py
max_warp_displacement) — 16/29/54 at 256/512/1024². Actual tanh flows are
usually far smaller, and per-warp FLOPs scale as band·S ≈ (2M+1)·(TL+2M):
a dynamic per-step bound M̂ = ceil(0.5 + scale·size/2·max|flow| + 2) would
shrink the band linearly (Pallas scalar-prefetch window offsets keep shapes
static; only loop trip counts go dynamic).

This probe measures max/p99 |flow| per synthesis block on (a) a random-init
generator and (b) the dynamics-probe's trained state when present
(tools/dynamics_probe.py writes /tmp/lcgan_dynamics/model), then reports the
implied M̂ and the projected FLOP ratio per block. Go/no-go evidence for
DESIGN.md — wire the dynamic windows only if trained flows stay well under
the bound.

Usage: python -m tools.flow_window_probe [--res 64] [--state /tmp/lcgan_dynamics]
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--state", type=str, default="/tmp/lcgan_dynamics")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass

    from lcgan_tpu.config import Config
    from lcgan_tpu.ops.filters import box_filter_3x3
    from lcgan_tpu.ops.grid_sample import max_warp_displacement
    from lcgan_tpu.train.steps import Trainer

    cfg = Config(
        model_name="/tmp/lcgan_flowprobe",
        img_resolution=args.res,
        batch_size=args.batch,
        compute_dtype="bfloat16",
    )
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    tag = "random-init"
    ckpt_dir = os.path.join(args.state, "model")
    if os.path.isdir(ckpt_dir):
        from lcgan_tpu.utils.checkpoint import CheckpointManager

        try:
            state = CheckpointManager(ckpt_dir).restore(state)
            tag = f"trained ({args.state})"
        except Exception as e:  # shape mismatch => res differs from the run
            print(f"could not restore {ckpt_dir}: {type(e).__name__} — using init")

    rng = np.random.default_rng(0)
    z1 = jnp.asarray(rng.standard_normal((args.batch, cfg.geo_noise_dim)), jnp.float32)
    z2 = jnp.asarray(rng.standard_normal((args.batch, cfg.app_noise_dim)), jnp.float32)

    gen = trainer.generator

    @jax.jit
    def capture(params, stats, z1, z2):
        _, inter = gen.apply(
            {"params": params, "stats": stats},
            z1,
            z2,
            1.0,
            mutable=["intermediates"],
            capture_intermediates=lambda mdl, name: mdl.name == "flow_layer",
        )
        return inter["intermediates"]

    inter = capture(state.ema_params, state.ema_stats, z1, z2)
    print(f"flow magnitudes [{tag}] res={args.res} batch={args.batch}")
    print("block  size  max|flow|  p99|flow|  M_static  M_hat   band×S ratio")
    for bi in range(cfg.num_blocks):
        raw = jax.tree.leaves(inter[f"block_{bi}"]["flow_layer"])[0]
        flow = np.asarray(
            jnp.tanh(box_filter_3x3(raw.astype(jnp.float32))), np.float32
        )
        size = flow.shape[1]
        amax = float(np.abs(flow).max())
        p99 = float(np.quantile(np.abs(flow), 0.99))
        m_static = max_warp_displacement(size, cfg.max_flow_scale)
        m_hat = int(math.ceil(0.5 + cfg.max_flow_scale * size / 2 * amax + 2.0))
        tl = min(size, 128)
        cost = lambda m: (2 * m + 1) * (tl + 2 * m)
        ratio = cost(m_hat) / cost(m_static)
        print(
            f"{bi:5d} {size:5d} {amax:10.4f} {p99:10.4f} {m_static:9d} {m_hat:6d}"
            f" {ratio:12.3f}"
        )
    # projection to flagship sizes, assuming the measured TOP-block max|flow|
    # transfers (the top block has the largest static M and dominates)
    top_raw = jax.tree.leaves(inter[f"block_{cfg.num_blocks - 1}"]["flow_layer"])[0]
    top = float(np.abs(np.asarray(jnp.tanh(box_filter_3x3(top_raw.astype(jnp.float32)))))
                .max())
    print(f"\nprojection with top-block max|flow|={top:.3f}:")
    for size in (256, 512, 1024):
        m_static = max_warp_displacement(size, cfg.max_flow_scale)
        m_hat = int(math.ceil(0.5 + cfg.max_flow_scale * size / 2 * top + 2.0))
        tl = 128
        cost = lambda m: (2 * m + 1) * (tl + 2 * m)
        print(
            f"  {size:5d}²: M {m_static} → {m_hat}, warp FLOP ratio "
            f"{cost(m_hat) / cost(m_static):.3f}"
        )


if __name__ == "__main__":
    main()
