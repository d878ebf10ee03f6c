"""Sweep (npack, unroll) for the warp kernels UNDER THE DYNAMIC BAND.

The fori_loop trip granularity of every banded kernel is ``unroll · npack``
band rows (ops/warp_pallas.py): a trip executes that many rows with exact
K = 0 weights for any row outside the tap window. The production defaults
(npack = 256/C, unroll = 4 at C < 128) were swept in round 3 on STATIC
bands, where granularity is irrelevant — under the dynamic band a typical
window is only 4-8 rows, so at C = 32 (npack 8, unroll 4) each trip
executes 32 rows for ~6 useful: up to 5× slack that the dyn band cannot
remove. This probe re-sweeps the pair at the flagship low-channel shapes
with trained-magnitude flows.

Parent mode spawns one subprocess per (npack, unroll) config (the override
is environment-scoped so kernel geometry and host wrappers stay
consistent, and each config compiles in a clean jit cache).

Usage: python -m tools.warp_dynpack_probe [--chain 12] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

# (b, hw, c): the dyn-band-eligible low-channel flagship warp shapes —
# 512² c64 (512² recipe top block) and 1024² c32 (1024² top block), plus
# 256² c128 / 512² c128 where npack=2 bounds what the sweep can win.
SHAPES = [(4, 512, 64), (2, 1024, 32), (8, 256, 128), (4, 128, 256)]

CONFIGS = [
    (0, 0),  # production defaults (npack=256/C, unroll = 2 if c>=128 else 4)
    (0, 2),  # default npack, unroll 2
    (0, 1),  # default npack, unroll 1
    (4, 2),
    (4, 1),
    (2, 2),
]


def child(chain: int, reps: int) -> None:
    import jax
    import jax.numpy as jnp

    from tools.warp_microbench import bench
    from lcgan_tpu.ops.grid_sample import max_warp_displacement
    from lcgan_tpu.ops.warp_pallas import grid_sample_bicubic_pallas

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    out = {}
    for b, hw, c in SHAPES:
        m = max_warp_displacement(hw, 0.1)
        f, fb = bench(
            grid_sample_bicubic_pallas, b, hw, c, m, chain, reps, jnp.bfloat16,
            flow_scale=0.03,  # trained-magnitude flows (dyn256 trajectory)
        )
        out[f"{hw}c{c}"] = (round(f, 2), round(fb, 2))
    print(json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args.chain, args.reps)
        return
    header = None
    for np_, un in CONFIGS:
        env = dict(os.environ)
        env["LCGAN_WARP_NPACK"] = str(np_)
        env["LCGAN_WARP_UNROLL"] = str(un)
        proc = subprocess.run(
            [sys.executable, "-m", "tools.warp_dynpack_probe", "--child",
             "--chain", str(args.chain), "--reps", str(args.reps)],
            capture_output=True, text=True, env=env, timeout=1500,
        )
        line = next(
            (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
        )
        if line is None:
            print(f"npack={np_ or 'def'} unroll={un or 'def'}: FAILED rc={proc.returncode} "
                  f"{proc.stderr.strip().splitlines()[-1] if proc.stderr.strip() else ''}",
                  flush=True)
            continue
        rec = json.loads(line)
        if header is None:
            header = "  config         | " + " | ".join(
                f"{k:>12s} f/f+b" for k in rec
            )
            print(header, flush=True)
        row = " | ".join(f"{v[0]:7.2f} {v[1]:8.2f}" for v in rec.values())
        print(f"  np={np_ or 'def'} un={un or 'def'}   | {row}", flush=True)


if __name__ == "__main__":
    main()
