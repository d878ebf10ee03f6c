"""Op-level attribution INSIDE D's block_0 at the 512²/1024² recipes.

tools/dblock_probe names block_0 as the D-trunk sink (512²: 13 ms fwd /
32.6 ms fwd+bwd at 9-11 TF/s vs 30-60 TF/s for the deeper blocks). This
probe times each op of the block in isolation — conv0 (k3 Cin→Cin),
lrelu+box filter, conv1 (k3 s2 Cin→Cout), skip (pool2 + 1×1) — plus the
1×1 from_rgb, each fwd and fwd+grad, chained inside one jit so the axon
tunnel's dispatch noise amortizes away.

Usage: python -m tools.b0_ops_probe [--res 512] [--batch 4] [--chain 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

PRECISION = jax.lax.Precision.DEFAULT


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    print(f"backend={jax.default_backend()}", flush=True)

    from lcgan_tpu.ops.filters import avg_pool_2x2, box_filter_3x3, leaky_relu

    b, r = args.batch, args.res
    ci = {1024: 32, 512: 64}.get(r, 128)
    co = ci * 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, r, r, ci)), jnp.bfloat16)
    img = jnp.asarray(rng.standard_normal((b, r, r, 3)), jnp.bfloat16)
    w0 = jnp.asarray(rng.standard_normal((3, 3, ci, ci)) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)
    wsk = jnp.asarray(rng.standard_normal((1, 1, ci, co)) * 0.05, jnp.bfloat16)
    wrgb = jnp.asarray(rng.standard_normal((1, 1, 3, ci)) * 0.05, jnp.bfloat16)

    def conv(x, w, s=1):
        k = w.shape[0]
        p = k // 2
        return jax.lax.conv_general_dilated(
            x, w, (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PRECISION,
        )

    # each op keeps channel count stable across chain links by a fixed
    # second conv back to Cin where needed — the probe subtracts nothing;
    # ratios between rows are what matters
    wback = jnp.asarray(rng.standard_normal((1, 1, co, ci)) * 0.05, jnp.bfloat16)
    wrgbback = jnp.asarray(rng.standard_normal((1, 1, ci, 3)) * 0.05, jnp.bfloat16)
    up = lambda y: jnp.concatenate([y, y], axis=1)  # restore H after s2 (cheap)

    OPS = {
        "conv0 k3 cin->cin": lambda y: conv(y, w0),
        "lrelu+box": lambda y: box_filter_3x3(leaky_relu(y, 0.2, 2**0.5)),
        "conv1 k3 s2 cin->co": lambda y: conv(up(conv(y, w1, 2)), wback),
        "skip pool+1x1": lambda y: conv(up(conv(avg_pool_2x2(y), wsk)), wback),
        "from_rgb 1x1 3->cin": lambda y: conv(conv(y, wrgbback), wrgb),
    }

    flops = {
        "conv0 k3 cin->cin": 2 * b * r * r * 9 * ci * ci,
        "lrelu+box": 0,
        "conv1 k3 s2 cin->co": 2 * b * (r // 2) ** 2 * 9 * ci * co,
        "skip pool+1x1": 2 * b * (r // 2) ** 2 * ci * co,
        "from_rgb 1x1 3->cin": 2 * b * r * r * 3 * ci,
    }

    for name, f in OPS.items():
        @jax.jit
        def fwd(y, f=f):
            for _ in range(args.chain):
                y = f(y)
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def grad(y, f=f):
            return jnp.sum(jax.grad(lambda y_: fwd(y_))(y).astype(jnp.float32))

        tf_ = timeit(fwd, x, reps=args.reps) / args.chain
        tg = timeit(grad, x, reps=args.reps) / args.chain
        gf = flops[name] / 1e9
        eff = f"{gf / tf_:6.1f} TF/s fwd" if gf else "          VPU"
        print(f"  {name:22s} fwd {tf_:6.2f} ms | fwd+grad {tg:6.2f} ms | {eff}", flush=True)


if __name__ == "__main__":
    main()
