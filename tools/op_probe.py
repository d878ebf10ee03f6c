"""Microbenchmark the generator's component ops on the real chip.

Isolates where the train step's time goes at 256²: modulated convs (up1/up2),
box filter, nearest upsample, bicubic warp (flat-gather vs patch-gather),
mapping QR, and the full synthesis block fwd/bwd.

All timings materialize a scalar (axon's block_until_ready is unreliable).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.ops.filters import box_filter_3x3, nearest_upsample_2x
from lcgan_tpu.ops.grid_sample import (
    grid_sample_bicubic,
    grid_sample_bicubic_patch,
    identity_like_coordinates,
)
from lcgan_tpu.ops.mapping import orthogonalize
from lcgan_tpu.ops.modulated import modulated_conv2d


def timed(name, fn, *args, n=8, flops=None):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # compile +真 barrier
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    extra = f"  {flops / dt / 1e12:7.2f} TF/s" if flops else ""
    print(f"{name:42s} {dt * 1000:9.2f} ms{extra}")
    return dt


def main():
    print(f"devices: {jax.devices()}")
    b, h, w = 16, 128, 128  # block-5 input scale at 256² (outputs 256²)
    cin, cout = 256, 128
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), dt)
    s = jax.random.normal(key, (b, cin), jnp.float32) + 1.0
    w3 = jax.random.normal(key, (3, 3, cin, cout), jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)

    big = jax.random.normal(key, (b, 2 * h, 2 * w, cout), dt)  # 256² x 128ch
    grid = (
        identity_like_coordinates(b, 2 * h, 2 * w)
        + jax.random.uniform(key, (b, 2 * h, 2 * w, 2), minval=-0.1, maxval=0.1)
    )

    mc_flops = 2 * b * (2 * h) * (2 * w) * cin * cout * 9
    timed("modulated_conv up=2 (256² out)", jax.jit(
        lambda x, s: modulated_conv2d(x, s, w3, bias, up=2, dtype=jnp.bfloat16)), x, s,
        flops=mc_flops)
    w3b = jax.random.normal(key, (3, 3, cout, cout), jnp.float32)
    timed("modulated_conv up=1 (256², 128ch)", jax.jit(
        lambda x, s: modulated_conv2d(x, s, w3b, bias, up=1, dtype=jnp.bfloat16)),
        big, jax.random.normal(key, (b, cout), jnp.float32),
        flops=2 * b * (2 * h) * (2 * w) * cout * cout * 9)
    timed("box_filter 256²x128", jax.jit(box_filter_3x3), big)
    timed("nearest_up 128²→256²", jax.jit(nearest_upsample_2x),
          jax.random.normal(key, (b, h, w, cout), dt))
    timed("warp flat-gather 256²x128", jax.jit(grid_sample_bicubic), big, grid)
    timed("warp patch-gather 256²x128", jax.jit(grid_sample_bicubic_patch), big, grid)
    timed("QR 64x64", jax.jit(lambda m: orthogonalize(jnp.tanh(m))),
          jax.random.normal(key, (64, 64)))
    timed("QR 512x512", jax.jit(lambda m: orthogonalize(jnp.tanh(m))),
          jax.random.normal(key, (512, 512)))

    # gradient through the warp
    def warp_loss(feat, g):
        return jnp.sum(jnp.square(grid_sample_bicubic(feat, g).astype(jnp.float32)))

    gfn = jax.jit(jax.grad(warp_loss, argnums=(0, 1)))
    t0 = time.perf_counter()
    out = gfn(big, grid)
    _ = float(jnp.sum(out[0].astype(jnp.float32)))
    print(f"{'warp flat grad (compile+run)':42s} {(time.perf_counter()-t0)*1000:9.2f} ms")
    t0 = time.perf_counter()
    for _ in range(4):
        out = gfn(big, grid)
    _ = float(jnp.sum(out[0].astype(jnp.float32)))
    print(f"{'warp flat grad steady':42s} {(time.perf_counter()-t0)/4*1000:9.2f} ms")


if __name__ == "__main__":
    main()
