"""Spatial resampling / filtering primitives (NHWC).

Parity targets:
  * box_filter_3x3 == torch ``avg_pool2d(k=3, s=1, p=1)`` with
    count_include_pad=True (custom_layers.py:136-138, :196-198) — the
    reference's stand-in for StyleGAN2's upfirdn2d blur.
  * avg_pool_2x2  == torch ``avg_pool2d(k=2, s=2, p=0)`` (custom_layers.py:202)
  * nearest_upsample_2x == ``F.interpolate(scale_factor=2, mode='nearest')``
    (custom_layers.py:146)

Implementation notes: everything is built from pad/slice/add/reshape — pure
VPU elementwise work that XLA fuses and that is reverse-mode differentiable
(``lax.reduce_window`` with a generic add computation is NOT differentiable
in jax 0.9, and these ops sit inside both G and D gradient paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sum3(x: jax.Array, axis: int) -> jax.Array:
    """Sum of the three 1-shifted copies along ``axis`` with zero padding."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    s = lambda o: jax.lax.slice_in_dim(xp, o, o + n, axis=axis)
    return s(0) + s(1) + s(2)


def box_filter_3x3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 average pool with zero padding, divisor always 9."""
    return _sum3(_sum3(x, 1), 2) * jnp.asarray(1.0 / 9.0, x.dtype)


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool, no padding."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return (y.sum(axis=(2, 4))) * jnp.asarray(0.25, x.dtype)


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample via broadcast+reshape (no gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2, gain: float = 1.0) -> jax.Array:
    """LeakyReLU with optional scalar gain (fused by XLA into neighbors)."""
    y = jax.nn.leaky_relu(x, negative_slope)
    if gain != 1.0:
        y = y * jnp.asarray(gain, y.dtype)
    return y
