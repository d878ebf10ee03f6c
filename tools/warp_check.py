"""On-device warp parity gate: Mosaic-compiled kernels vs the banded XLA form.

Interpret-mode tests (tests/test_warp_pallas.py) pin the kernel MATH; this
gate pins the Mosaic-COMPILED behavior on the real chip — fwd, d/dgrid, and
every d/dx path (small-map slab, scatter+overlap-add at C < 128, gather at
C >= 128) — at the flagship block shapes of the 256/512/1024 generators.

Run: python -m tools.warp_check            (add --bf16 for compute-dtype run)
Exit code 0 = all shapes allclose; each line records the max abs error.
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.ops.grid_sample import (
    grid_sample_bicubic_banded,
    identity_like_coordinates,
    max_warp_displacement,
)
from lcgan_tpu.ops.warp_pallas import grid_sample_bicubic_pallas

# (batch, size, channels) — every warp shape the three flagship generators
# run: 256² uses maps 8..256, 512² adds 512/c64, 1024² adds 1024/c32.
SHAPES = [
    (8, 8, 512),  # small-map kernel path
    (8, 16, 512),
    (8, 32, 512),
    (8, 64, 512),
    (8, 64, 128),  # small-map with npack=2
    (8, 128, 256),  # general kernel, scatter-dx (C < 128? no: 256 -> gather)
    (8, 256, 128),  # general kernel, gather-dx (C >= 128)
    (8, 512, 64),  # general kernel, scatter-dx + overlap-add (C < 128)
    (2, 1024, 32),  # general kernel, scatter-dx, deepest band (M = 54)
]


def check(b, hw, c, dtype, tol_scale, small_flow=False):
    m = max_warp_displacement(hw, 0.1)
    rng = np.random.default_rng(hw + c)
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), dtype)
    flow = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 2)), jnp.float32)
    # The in-kernel dynamic band (_dyn_window) sizes windows from the flow
    # itself, so BOTH regimes must be pinned on device: full-bound flow
    # (windows ≈ the static band) and trained-magnitude flow (~0.3 of the
    # bound — the short-window steady state production runs in).
    grid = identity_like_coordinates(b, hw, hw) + flow * (0.03 if small_flow else 0.1)
    cot = jnp.asarray(rng.standard_normal((b, hw, hw, c)), dtype)
    pallas_fn = grid_sample_bicubic_pallas

    def run(f):
        fwd = jax.jit(lambda x_, g_: f(x_, g_, m))

        def loss(x_, g_, cot_):  # cot passed as arg: closures >100MB hit the
            return jnp.sum((f(x_, g_, m) * cot_).astype(jnp.float32))  # axon 413 limit

        dx, dg = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, grid, cot)
        return np.asarray(fwd(x, grid), np.float32), np.asarray(dx, np.float32), np.asarray(dg)

    ref = run(grid_sample_bicubic_banded)
    out = run(pallas_fn)

    names = ("fwd", "d/dx", "d/dgrid")
    tols = (2e-4 * tol_scale, 2e-4 * tol_scale, 2e-2 * tol_scale)
    errs, ok = [], True
    for r, o, name, tol in zip(ref, out, names, tols):
        scale = max(np.abs(r).max(), 1.0)
        err = np.abs(o - r).max() / scale
        errs.append(f"{name} {err:.2e}")
        ok &= bool(err < tol) and bool(np.isfinite(o).all())
    tag = " small-flow(short windows)" if small_flow else ""
    print(f"{hw:5d}² c{c:3d} b{b} M={m:3d} | {' | '.join(errs)} | "
          f"{'OK' if ok else 'FAIL'}{tag}", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true", help="check in bfloat16 (looser tolerance)")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    tol_scale = 100.0 if args.bf16 else 1.0
    print(f"backend={jax.default_backend()} dtype={dtype.__name__}", flush=True)
    oks = []
    for b, hw, c in SHAPES:
        for small_flow in (False, True):
            try:
                oks.append(check(b, hw, c, dtype, tol_scale, small_flow))
            except Exception as e:  # OOM on one shape must not kill the gate
                print(f"{hw:5d}² c{c:3d} b{b} | ERROR {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                oks.append(False)
    ok = all(oks)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
