"""Clean per-op warp timings: N chained applications inside ONE jit.

The axon tunnel adds ~25-30 ms per dispatch, drowning ops in the
millisecond range; timing `n` data-dependent applications inside one jitted
graph amortizes dispatch to nothing and forces serialization (each
iteration consumes the previous one's output). Reports per-application
forward and forward+backward times for the banded XLA scan vs the Pallas
kernels at any (b, hw, c) list.

Usage: python -m tools.warp_microbench [--chain 16] [--reps 4]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.ops.grid_sample import (
    grid_sample_bicubic_banded,
    identity_like_coordinates,
    max_warp_displacement,
)
from lcgan_tpu.ops.warp_pallas import grid_sample_bicubic_pallas


def _pallas_static(x, grid, m):
    """Round-2 behavior: static full-band trip counts (dyn=False)."""
    return grid_sample_bicubic_pallas(x, grid, m, False, True, False)

SHAPES = [
    (8, 8, 512),
    (8, 16, 512),
    (8, 32, 512),
    (8, 64, 512),
    (8, 64, 128),
    (8, 128, 256),
    (8, 256, 128),
]


def bench(f, b, hw, c, m, chain, reps, dtype, flow_scale=0.1):
    rng = np.random.default_rng(hw + c)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), dtype)
    grid = identity_like_coordinates(b, hw, hw) + jnp.asarray(
        rng.uniform(-flow_scale, flow_scale, (b, hw, hw, 2)), jnp.float32
    )

    @jax.jit
    def fwd_chain(x, grid):
        for _ in range(chain):
            x = f(x, grid, m)
        return jnp.sum(x.astype(jnp.float32))

    def vjp_body(x, grid):
        def loss(x_):
            return jnp.sum(jnp.square(f(x_, grid, m).astype(jnp.float32)))

        return jax.grad(loss)(x)

    @jax.jit
    def bwd_chain(x, grid):
        for _ in range(chain):
            x = vjp_body(x, grid).astype(dtype)
        return jnp.sum(x.astype(jnp.float32))

    def timeit(fn):
        float(fn(x, grid))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(x, grid))
        return (time.perf_counter() - t0) / reps / chain * 1000

    return timeit(fwd_chain), timeit(bwd_chain)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    ap.add_argument("--adaptive", action="store_true",
                    help="A/B the in-kernel dynamic band (dyn=True, default "
                    "production path) vs static full-band trip counts")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    print(f"backend={jax.default_backend()} dtype={dtype.__name__} chain={args.chain}",
          flush=True)
    if args.adaptive:
        shapes = [(8, 128, 256), (8, 256, 128), (8, 512, 64), (2, 1024, 32)]
        print("  shape              | static fwd  fwd+bwd |   dyn fwd  fwd+bwd | speedup")
        for b, hw, c in shapes:
            m = max_warp_displacement(hw, 0.1)
            pf, pb = bench(
                _pallas_static, b, hw, c, m, args.chain, args.reps, dtype,
                flow_scale=0.03,  # trained-magnitude flow
            )
            af, ab = bench(
                grid_sample_bicubic_pallas, b, hw, c, m, args.chain, args.reps,
                dtype, flow_scale=0.03,
            )
            print(
                f"  {hw:4d}² c{c:3d} b{b} M={m:3d} | {pf:9.2f} {pb:8.2f} |"
                f" {af:9.2f} {ab:8.2f} | {pb / ab:5.2f}×",
                flush=True,
            )
        return
    print("  shape              |   scan fwd  fwd+bwd |  pallas fwd  fwd+bwd | speedup")
    for b, hw, c in SHAPES:
        m = max_warp_displacement(hw, 0.1)
        sf, sb = bench(grid_sample_bicubic_banded, b, hw, c, m, args.chain, args.reps, dtype)
        pf, pb = bench(grid_sample_bicubic_pallas, b, hw, c, m, args.chain, args.reps, dtype)
        print(
            f"  {hw:4d}² c{c:3d} b{b} M={m:3d} | {sf:9.2f} {sb:8.2f} |"
            f" {pf:10.2f} {pb:8.2f} | {sb / pb:5.2f}×",
            flush=True,
        )


if __name__ == "__main__":
    main()
