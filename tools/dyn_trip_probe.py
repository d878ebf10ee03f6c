"""Probe: dynamic fori_loop trip counts in Mosaic kernels.

If a band sweep can run a data-dependent number of packs, the flow-adaptive
warp no longer needs its two-branch ``lax.cond`` (and that cond's scheduling
barriers): ONE kernel prices the band by the measured flow, continuously,
with no fallback cliff. This probe answers, on the real chip:

  1) does Mosaic lower ``lax.fori_loop`` with a traced (SMEM scalar) bound?
  2) at a matched trip count, what is the overhead vs a static loop?
  3) does halving the dynamic count halve the time (i.e. the loop really
     is data-dependent, not padded to the static worst case)?

Usage: python -m tools.dyn_trip_probe [--packs 16] [--reps 64]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST


def _static_kernel(x_ref, w_ref, o_ref, *, npk):
    acc = jnp.zeros_like(o_ref)

    def body(i, acc):
        return acc + jax.lax.dot(x_ref[i], w_ref[...], precision=HI)

    o_ref[...] = jax.lax.fori_loop(0, npk, body, acc)


def _dyn_kernel(n_ref, x_ref, w_ref, o_ref):
    acc = jnp.zeros_like(o_ref)

    def body(i, acc):
        return acc + jax.lax.dot(x_ref[i], w_ref[...], precision=HI)

    o_ref[...] = jax.lax.fori_loop(0, n_ref[0], body, acc)


def build(packs: int, dyn: bool):
    out_shape = jax.ShapeDtypeStruct((256, 256), jnp.float32)
    x_spec = pl.BlockSpec(memory_space=pl.ANY)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    if dyn:
        return pl.pallas_call(
            _dyn_kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vm, vm],
            out_specs=vm,
        )
    return pl.pallas_call(
        functools.partial(_static_kernel, npk=packs),
        out_shape=out_shape,
        in_specs=[vm, vm],
        out_specs=vm,
    )


def timeit(fn, *args, reps):
    out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packs", type=int, default=16)
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--chain", type=int, default=32, help="kernel calls chained per jit")
    args = ap.parse_args()
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    print(f"devices: {jax.devices()}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.packs, 256, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 256)), jnp.float32)

    def chain(call, with_n):
        # data-dependent chain of kernel calls amortizes dispatch noise
        def fn(x0, *rest):
            y = x0
            for _ in range(args.chain):
                out = call(*rest[:1], y, w) if with_n else call(y, w)
                y = y.at[0].set(out)
            return y

        return jax.jit(fn)

    static = build(args.packs, dyn=False)
    dyn = build(args.packs, dyn=True)

    # correctness first: dynamic(n=packs) == static(packs); n=k matches a
    # static loop of k
    ref = static(x, w)
    got = dyn(jnp.array([args.packs], jnp.int32), x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
    k = args.packs // 2
    ref_half = build(k, dyn=False)(x, w)
    got_half = dyn(jnp.array([k], jnp.int32), x, w)
    np.testing.assert_allclose(np.asarray(got_half), np.asarray(ref_half), rtol=1e-6)
    print("correctness: dynamic bound == static loop at n and n/2")

    t_static = timeit(chain(static, False), x, reps=args.reps)
    n_full = jnp.array([args.packs], jnp.int32)
    n_half = jnp.array([k], jnp.int32)
    t_dyn_full = timeit(chain(dyn, True), x, n_full, reps=args.reps)
    t_dyn_half = timeit(chain(dyn, True), x, n_half, reps=args.reps)
    print(
        f"packs={args.packs} chain={args.chain}: static {t_static:.3f} ms | "
        f"dyn(n={args.packs}) {t_dyn_full:.3f} ms ({t_dyn_full / t_static:.2f}x) | "
        f"dyn(n={k}) {t_dyn_half:.3f} ms ({t_dyn_half / t_static:.2f}x)"
    )
    verdict = (
        "GO: dynamic bound is ~free and scales with n"
        if t_dyn_full < 1.15 * t_static and t_dyn_half < 0.75 * t_static
        else "NO-GO: dynamic bound costs too much or does not scale"
    )
    print(verdict)


if __name__ == "__main__":
    main()
