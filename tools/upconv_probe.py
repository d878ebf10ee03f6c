"""Is XLA-TPU naive about lhs-dilated (transposed) convs? Measure it.

The generator's up=2 modulated conv (ops/modulated.py) reproduces torch
``conv_transpose2d(stride=2, padding=1, output_padding=1)`` via
``conv_general_dilated(lhs_dilation=2)``. If the TPU conv emitter does not
exploit the zero structure, 3/4 of the MACs multiply zeros: a k=3/s=2
transpose decomposes exactly into FOUR phase convs — 1x1, 1x2, 2x1, 2x2
taps (9 MACs per INPUT pixel total, vs 9 per OUTPUT pixel = 36 per input
naive) — interleaved to (B, 2H, 2W, O).

This probe times both forms (fwd and fwd+grad, chained to amortize the
axon dispatch overhead), checks numerical equality, and prints XLA's
cost_analysis FLOPs for each — which also calibrates bench.py's MFU
numerator (a naive count overstates useful FLOPs 4x on these convs).

Usage: python -m tools.upconv_probe [--chain 8] [--reps 4]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

PRECISION = jax.lax.Precision.DEFAULT

# (batch, in_res, I, O): the flagship generators' up-conv geometries
SHAPES = [
    (8, 32, 512, 512),
    (8, 64, 512, 256),
    (8, 128, 256, 128),
    (4, 256, 128, 64),
    (2, 512, 64, 32),
]


def up_dilated(x, w):
    """The current form: flipped kernel over an lhs-dilated input."""
    k = w.shape[0]
    pad = (k - 1) // 2
    lo, hi = k - 1 - pad, k - pad
    return jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=(0, 1)),
        window_strides=(1, 1),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=PRECISION,
    )


def up_phases(x, w):
    """Exact phase decomposition of the same transpose (k=3, s=2, p=1, op=1).

    With flipped kernel w_t and lo=1 left zeros, output index o=2i touches
    dilated taps {2i-1, 2i, 2i+1} -> only 2i is a data row: y[2i] = w_t[1] x[i].
    o=2i+1 touches {2i, 2i+2}: y[2i+1] = w_t[0] x[i] + w_t[2] x[i+1]
    (x[H] reads as zero = output_padding). Separable in H and W, so the four
    2-D phases use tap sets {1}x{1}, {1}x{0,2}, {0,2}x{1}, {0,2}x{0,2}.
    """
    w_t = jnp.flip(w, axis=(0, 1))
    b, h, wd, _ = x.shape
    o = w.shape[-1]

    def conv(xp, kern, pads):
        return jax.lax.conv_general_dilated(
            xp,
            kern,
            window_strides=(1, 1),
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=PRECISION,
        )

    ee = conv(x, w_t[1:2, 1:2], ((0, 0), (0, 0)))  # (b,h,w,o)
    eo = conv(x, w_t[1:2, 0::2], ((0, 0), (0, 1)))  # taps x[:, j], x[:, j+1]
    oe = conv(x, w_t[0::2, 1:2], ((0, 1), (0, 0)))
    oo = conv(x, w_t[0::2, 0::2], ((0, 1), (0, 1)))
    # interleave phases: out[2i+py, 2j+px]
    rows_e = jnp.stack([ee, eo], axis=3).reshape(b, h, 2 * wd, o)
    rows_o = jnp.stack([oe, oo], axis=3).reshape(b, h, 2 * wd, o)
    return jnp.stack([rows_e, rows_o], axis=2).reshape(b, 2 * h, 2 * wd, o)


def timeit(fn, *args, reps=4):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    print(f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    for b, r, i_c, o_c in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, r, r, i_c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, i_c, o_c)) * 0.02, jnp.bfloat16)

        # parity first (fp32, single call)
        xf, wf = x.astype(jnp.float32), w.astype(jnp.float32)
        ref, got = up_dilated(xf, wf), up_phases(xf, wf)
        err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-12))

        def chain(f):
            # data-dependent chain: project out back to in channels between
            # applications so each iteration consumes the previous output
            p = jnp.asarray(rng.standard_normal((o_c, i_c)) * 0.02, jnp.bfloat16)

            @jax.jit
            def fwd(x, w):
                y = x
                for _ in range(args.chain):
                    u = f(y, w)  # (b, 2r, 2r, o)
                    y = avg2(u) @ p
                return jnp.sum(y.astype(jnp.float32))

            @jax.jit
            def grad(x, w):
                return jnp.sum(jax.grad(lambda w_: fwd(x, w_))(w).astype(jnp.float32))

            return fwd, grad

        def avg2(u):
            bb, hh, ww, cc = u.shape
            return u.reshape(bb, hh // 2, 2, ww // 2, 2, cc).mean((2, 4))

        fd, gd = chain(up_dilated)
        fp, gp = chain(up_phases)
        fd_t, fp_t = timeit(fd, x, w, reps=args.reps), timeit(fp, x, w, reps=args.reps)
        gd_t, gp_t = timeit(gd, x, w, reps=args.reps), timeit(gp, x, w, reps=args.reps)
        fl_d = fd.lower(x, w).compile().cost_analysis().get("flops", 0.0)
        fl_p = fp.lower(x, w).compile().cost_analysis().get("flops", 0.0)
        print(
            f"  {r:4d}->{2*r:4d} I{i_c} O{o_c} b{b} | rel_err {err:.1e} | "
            f"fwd {fd_t/args.chain:7.2f} vs {fp_t/args.chain:7.2f} ms | "
            f"fwd+grad {gd_t/args.chain:7.2f} vs {gp_t/args.chain:7.2f} ms | "
            f"xla_flops {fl_d/1e9:.1f} vs {fl_p/1e9:.1f} G",
            flush=True,
        )


if __name__ == "__main__":
    main()
