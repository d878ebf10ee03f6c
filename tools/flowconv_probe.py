"""Cost of the flow-field convs: up=2 k=3 convs with TWO output channels.

Every SynthesisBlock computes its flow field with a modulated up-conv to
Co=2 (custom_layers.py:149-151) — 2/128 MXU lanes. This probe times the
dilated form (production) at the flagship top-block geometries, fwd and
fwd+grad, next to two alternatives:

  * wide-slice: run the same conv to Co=32 zero-padded weights and slice
    [:2] — 16x the MACs but full(er) lanes; tests whether the emitter's
    Co=2 path is MAC-bound or lane-bound.
  * sum-of-shifts: evaluate the transpose's four phases as 9 shifted
    1x1 matmuls (K=C on lanes via dot to Co=2) — no im2col blowup.

Usage: python -m tools.flowconv_probe [--chain 8] [--reps 3]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

PRECISION = jax.lax.Precision.DEFAULT

# (batch, in_res, Cin): flow conv geometry at the flagships' top blocks
SHAPES = [
    (2, 512, 64),   # 1024² recipe, top block
    (4, 256, 128),  # 512² recipe, top block
    (8, 128, 128),  # 256² recipe, top block
    (8, 128, 256),  # 256² recipe, block 4
]


def up2_dilated(x, w):
    """Production form: conv_transpose2d(s=2, p=1, op=1) via lhs dilation."""
    w_t = jnp.flip(w, axis=(0, 1))
    return jax.lax.conv_general_dilated(
        x, w_t, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PRECISION,
    )


def up2_wide(x, w, wide=32):
    co = w.shape[-1]
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, wide - co)))
    return up2_dilated(x, wp)[..., :co]


def up2_phases_mm(x, w):
    """Phases as shifted matmuls: y_phase = Σ_taps shift(x) @ w[tap]."""
    b, h, wd, c = x.shape
    o = w.shape[-1]
    w_t = jnp.flip(w, axis=(0, 1))

    def mm(xs, kern):  # (B,H,W,C) @ (C,O)
        return jax.lax.dot_general(
            xs, kern, (((3,), (0,)), ((), ())), precision=PRECISION,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def shift(x, dy, dx):  # x[i+dy, j+dx] with zero pad
        return jnp.pad(x, ((0, 0), (max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)), (0, 0)))[
            :, max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + wd, :
        ]

    # output row 2i   <- taps row {1};    row 2i+1 <- taps rows {0 (i), 2 (i+1)}
    # output col 2j   <- taps col {1};    col 2j+1 <- taps cols {0 (j), 2 (j+1)}
    ee = mm(x, w_t[1, 1])
    eo = mm(x, w_t[1, 0]) + mm(shift(x, 0, -1), w_t[1, 2])
    oe = mm(x, w_t[0, 1]) + mm(shift(x, -1, 0), w_t[2, 1])
    oo = (
        mm(x, w_t[0, 0])
        + mm(shift(x, 0, -1), w_t[0, 2])
        + mm(shift(x, -1, 0), w_t[2, 0])
        + mm(shift(x, -1, -1), w_t[2, 2])
    )
    rows_e = jnp.stack([ee, eo], axis=3).reshape(b, h, 2 * wd, o)
    rows_o = jnp.stack([oe, oo], axis=3).reshape(b, h, 2 * wd, o)
    return jnp.stack([rows_e, rows_o], axis=2).reshape(b, 2 * h, 2 * wd, o)


def timeit(fn, *args, reps=3, chain=8):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps / chain * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    print(f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    forms = {"dilated": up2_dilated, "wide32": up2_wide, "phase-mm": up2_phases_mm}
    for b, r, ci in SHAPES:
        x = jnp.asarray(rng.standard_normal((b, r, r, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, 2)) * 0.05, jnp.bfloat16)

        ref = up2_dilated(x.astype(jnp.float32), w.astype(jnp.float32))
        for name, f in list(forms.items())[1:]:
            got = f(x.astype(jnp.float32), w.astype(jnp.float32))
            err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-12))
            assert err < 1e-5, (name, err)

        row = [f"{r:4d}²in c{ci}->2 b{b}"]
        for name, f in forms.items():
            # chain must keep shapes fixed: pool the 2x output back down
            @jax.jit
            def fwd(x, w, f=f):
                y = x
                for _ in range(args.chain):
                    fl = f(y, w)
                    y = y * jnp.mean(fl.astype(y.dtype), axis=-1, keepdims=True)[:, ::2, ::2]
                return jnp.sum(y.astype(jnp.float32))

            @jax.jit
            def grad(x, w, fwd=fwd):
                return jnp.sum(jax.grad(lambda w_: fwd(x, w_))(w).astype(jnp.float32))

            tf = timeit(fwd, x, w, reps=args.reps, chain=args.chain)
            tg = timeit(grad, x, w, reps=args.reps, chain=args.chain)
            row.append(f"{name} {tf:5.2f}/{tg:6.2f}")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
