"""Probe TPU lowering strategies for the bicubic warp's gathers."""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lcgan_tpu.ops.grid_sample import grid_sample_bicubic_patch, identity_like_coordinates


def bench(name, fn, *args, n=8):
    try:
        out = fn(*args)
        _ = float(jnp.sum(out[0].astype(jnp.float32) if isinstance(out, tuple) else out.astype(jnp.float32)))
    except Exception as e:
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out[0].astype(jnp.float32) if isinstance(out, tuple) else out.astype(jnp.float32)))
    print(f"{name:44s} {(time.perf_counter() - t0) / n * 1000:9.2f} ms")


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    b, hh, ww, c = 16, 256, 256, 128
    x = jax.random.normal(key, (b, hh, ww, c), jnp.bfloat16)
    grid = (
        identity_like_coordinates(b, hh, ww)
        + jax.random.uniform(key, (b, hh, ww, 2), minval=-0.1, maxval=0.1)
    )

    # --- A: pallas kernel doing take_along_axis along sublanes ---
    def pk(x_ref, idx_ref, o_ref):
        vals = x_ref[:]             # (256, 128)
        idx = idx_ref[:]            # (256, 128) int32
        o_ref[:] = jnp.take_along_axis(vals, idx, axis=0)

    def pallas_gather(xx, idx):
        return pl.pallas_call(
            pk,
            out_shape=jax.ShapeDtypeStruct(idx.shape, xx.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xx, idx)

    xx = jax.random.normal(key, (256, 128), jnp.float32)
    idx = jax.random.randint(key, (256, 128), 0, 256)
    bench("A: pallas take_along_axis (256,128)", jax.jit(pallas_gather), xx, idx, n=20)

    # --- B: two-stage axis gather at warp scale ---
    def two_stage(x, grid):
        gb, gh, gw, _ = grid.shape
        fx = ((grid[..., 0] + 1.0) * gw - 1.0) * 0.5
        fy = ((grid[..., 1] + 1.0) * gh - 1.0) * 0.5
        iy0 = jnp.clip(jnp.floor(fy).astype(jnp.int32) - 1, 0, gh - 4)
        ix0 = jnp.clip(jnp.floor(fx).astype(jnp.int32) - 1, 0, gw - 4)
        # stage 1: gather 4 rows per output pixel along axis=1
        ys = (iy0[:, :, None, :] + jnp.arange(4)[None, None, :, None]).reshape(gb, gh * 4, gw)
        rows = jnp.take_along_axis(x, ys[..., None], axis=1)  # (B, 4H, W, C)
        # stage 2: gather 4 cols along axis=2
        xs = (ix0[:, :, None, :] + jnp.arange(4)[None, None, :, None])  # (B,H,4,W)
        xs4 = jnp.broadcast_to(xs[:, :, None, :, :], (gb, gh, 4, 4, gw)).reshape(gb, gh * 4, 4 * gw)
        # rows is (B, 4H, W, C); gather cols per (b, 4h) row
        taps = jnp.take_along_axis(
            rows, xs4.reshape(gb, gh * 4, 4, gw).transpose(0, 1, 3, 2).reshape(gb, gh * 4, gw * 4)[..., None],
            axis=2,
        )  # (B, 4H, 4W, C) -- [y-tap major, x-tap minor]
        return taps

    bench("B: two-stage axis gathers (taps only)", jax.jit(two_stage), x, grid, n=4)

    # --- C: patch-gather forward + grad ---
    bench("C: patch fwd 256²x128", jax.jit(grid_sample_bicubic_patch), x, grid, n=4)

    def loss(feat, g):
        return jnp.sum(jnp.square(grid_sample_bicubic_patch(feat, g).astype(jnp.float32)))

    bench("C: patch grad 256²x128", jax.jit(jax.grad(loss, argnums=(0, 1))), x, grid, n=4)


if __name__ == "__main__":
    main()
