"""Width-packed conv: fold p adjacent output pixels into MXU lanes.

D's trunk (and G's top blocks) at 1024²/512² run k=3 convs with 16-64
output channels — the conv's lane dim — so XLA pads 16/128ths of the MXU
with data and the rest with zeros (measured ~12 TF/s of ~197 peak at
1024², step_breakdown_probe). Re-blocking the SAME conv as a band-Toeplitz
matmul packs p = 128//Co adjacent output pixels' channels onto lanes:

    out[b, h, g, (q, co)] = Σ_{ky, j, ci} xs[b, h, g, (ky, j, ci)] ·
                            W'[(ky, j, ci), (q, co)]

where xs is the (3 row-shifts) × (p+2 col strip) × C patch of group g —
built from pad + reshape + concat only — and W'[(ky, q+kx, ci), (q, co)]
= w[ky, kx, ci, co] (zero elsewhere). MAC inflation (p+2)/3 buys p× lane
utilization: net ~2.4×/2×/1.5× bound at C_out = 16/32/64. The probe times
fwd and fwd+grad against lax.conv at the D-trunk geometries and checks
exactness.

Usage: python -m tools.packconv_probe [--chain 8] [--reps 3]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

PRECISION = jax.lax.Precision.DEFAULT

# (batch, res, Cin, Cout): REAL D-trunk conv0 geometries of the flagships
# (block 0 conv0 is Cin->Cin at full res; Cout drives the pack factor)
SHAPES = [
    (2, 1024, 32, 32),  # 1024² recipe, D block 0 conv0
    (2, 512, 64, 64),   # 1024² recipe, D block 1 conv0
    (4, 512, 64, 64),   # 512² recipe, D block 0 conv0
    (8, 256, 128, 128), # 256² recipe, D block 0 conv0 (p=1 → skipped)
]


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=PRECISION,
    )


def _pack_w(w, p):
    """(3, 3, C, Co) -> (3*(p+2)*C, p*Co) band-Toeplitz rhs."""
    k, _, c, co = w.shape
    rhs = jnp.zeros((k, p + 2, c, p, co), w.dtype)
    for q in range(p):
        rhs = rhs.at[:, q : q + 3, :, q, :].add(jnp.transpose(w, (0, 1, 2, 3)))
    return rhs.reshape(k * (p + 2) * c, p * co)


def conv_packed(x, w, p):
    """Exact k=3/s=1/same conv via the width-packed matmul."""
    assert p >= 2, "p=1 is the plain conv — nothing to pack"
    b, h, wd, c = x.shape
    co = w.shape[-1]
    g = wd // p
    # pad rows/cols by 1 (same conv), plus p-2 extra right cols so the
    # "next two" windows reshape at stride p without overlap
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, max(p - 1, 1)), (0, 0)))
    # column strips: group g's p own cols ++ the following 2 cols
    own = xp[:, :, : g * p, :].reshape(b, h + 2, g, p * c)
    nxt2 = (
        xp[:, :, p : p + g * p, :]
        .reshape(b, h + 2, g, p, c)[:, :, :, :2, :]
        .reshape(b, h + 2, g, 2 * c)
    )
    strip = jnp.concatenate([own, nxt2], axis=-1)  # (B, H+2, G, (p+2)C)
    # fold the 3 row taps
    xs = jnp.concatenate([strip[:, i : i + h] for i in range(3)], axis=-1)
    rhs = _pack_w(w, p)  # (3(p+2)C, pCo)
    y = jax.lax.dot_general(
        xs, rhs, (((3,), (0,)), ((), ())),
        precision=PRECISION, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y.reshape(b, h, wd, co)


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
    for b, r, ci, co in SHAPES:
      # p need not stop at 128//Co: N = p·Co > 128 is just more lane tiles.
      # Inflation (p+2)/3 grows with p, so larger p only pays if XLA tiles
      # the bigger-N matmul disproportionately better. Sweep to find out.
      for p in (2, 4, 8):
        if co * p > 512 or r % p != 0 or 128 // co > p:
            continue
        x = jnp.asarray(rng.standard_normal((b, r, r, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)

        # exactness (fp32)
        ref = conv_ref(x.astype(jnp.float32), w.astype(jnp.float32))
        got = conv_packed(x.astype(jnp.float32), w.astype(jnp.float32), p)
        err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-12))

        def chain(f):
            @jax.jit
            def fwd(x, w):
                y = x
                for _ in range(args.chain):
                    y = f(y, w)
                return jnp.sum(y.astype(jnp.float32))

            @jax.jit
            def grad(x, w):
                return jnp.sum(jax.grad(lambda w_: fwd(x, w_))(w).astype(jnp.float32))

            return fwd, grad

        fr, gr = chain(conv_ref)
        fp_, gp = chain(functools.partial(conv_packed, p=p))
        t = [timeit(fn, x, w, reps=args.reps) / args.chain for fn in (fr, fp_, gr, gp)]
        print(
            f"  {r:4d}² c{ci}->{co} b{b} p={p} | rel_err {err:.1e} | "
            f"fwd {t[0]:6.2f} vs {t[1]:6.2f} ms ({t[0]/t[1]:4.2f}x) | "
            f"fwd+grad {t[2]:6.2f} vs {t[3]:6.2f} ms ({t[2]/t[3]:4.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
