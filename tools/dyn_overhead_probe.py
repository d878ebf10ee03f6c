"""Attribute the dynamic band's cost: window math vs saved band trips.

Times the general FORWARD warp kernel (`_fwd_call`) in three modes at the
flagship general-kernel geometries:

  static  (dyn=0): static full band — round-2 behavior, Mosaic can unroll
  overhead(dyn=2): computes the per-row window AND runs a traced trip
                   count, but forces the count to the full band — pays the
                   window math + while-loop lowering, saves nothing
  dynamic (dyn=1): tap-exact windows, trips track the actual flow

(overhead − static) isolates the in-kernel window cost; (dynamic −
overhead) is the value of the saved trips. If overhead − static dominates,
move the window computation to XLA and pass (p0, trips) via SMEM.

Usage: python -m tools.dyn_overhead_probe [--chain 16] [--reps 4] [--scale 0.3]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.ops.grid_sample import identity_like_coordinates, max_warp_displacement
from lcgan_tpu.ops.warp_pallas import _fwd_call

# (batch, size, channels): the general-kernel blocks of the flagships
SHAPES = [(8, 128, 256), (8, 256, 128), (4, 512, 64), (2, 1024, 32)]


def timeit(fn, *args, reps=4):
    out = fn(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--scale", type=float, default=0.3, help="flow scale vs tanh bound")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    print(f"backend={jax.default_backend()} flow_scale={args.scale}", flush=True)

    rng = np.random.default_rng(0)
    for b, hw, c in SHAPES:
        mfs = 0.1
        m = max_warp_displacement(hw, mfs)
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.bfloat16)
        flow = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 2)), jnp.float32)
        grid = identity_like_coordinates(b, hw, hw) + flow * mfs * args.scale

        def chain(mode):
            @jax.jit
            def f(x, grid):
                y = x
                for _ in range(args.chain):
                    y = _fwd_call(y, grid, m, False, note=False, dyn=mode)
                return y

            return f

        t0 = timeit(chain(False), x, grid, reps=args.reps) / args.chain
        t2 = timeit(chain(2), x, grid, reps=args.reps) / args.chain
        t1 = timeit(chain(True), x, grid, reps=args.reps) / args.chain
        print(
            f"  {hw:5d}² c{c:3d} b{b} M={m:3d} | static {t0:7.3f} | overhead {t2:7.3f} "
            f"(+{t2-t0:+.3f}) | dynamic {t1:7.3f} ({t1/t0:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
