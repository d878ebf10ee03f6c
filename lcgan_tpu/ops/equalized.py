"""Equalized learning-rate layers (StyleGAN convention).

Behavioral parity with the reference:
  * runtime weight scale ``c = lr_mul / sqrt(fan_in)`` with params initialized
    ``randn / lr_mul`` (custom_layers.py:7-14)
  * bias param initialized to a constant and multiplied by ``lr_mul`` in the
    forward pass (custom_layers.py:17-25, :28-44)

TPU-first differences: NHWC/HWIO layouts, compute dtype separated from the
fp32 parameter dtype, fp32 MXU accumulation.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# fp32 inputs: force the true-fp32 algorithm (XLA CPU's default conv path is
# a low-precision oneDNN fast path; on TPU this selects the 6-pass bf16
# decomposition). bf16 inputs are unaffected — the MXU path is native.
PRECISION = jax.lax.Precision.HIGHEST


def equalized_scale(fan_in: int, lr_mul: float = 1.0) -> float:
    """He-style runtime scale: 1/sqrt(fan_in) * lr_mul (custom_layers.py:10)."""
    return lr_mul / math.sqrt(fan_in)


def _equalized_init(lr_mul: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) / lr_mul

    return init


class EqualizedLinear(nn.Module):
    """Linear layer with equalized LR (custom_layers.py:17-25)."""

    features: int
    bias_init: float = 0.0
    lr_mul: float = 1.0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        # Stored as (in, out) so the forward pass is a plain x @ w.
        w = self.param("weight", _equalized_init(self.lr_mul), (in_features, self.features))
        c = equalized_scale(in_features, self.lr_mul)
        # NOTE: no preferred_element_type upcast here — the dot/conv transpose
        # rules require cotangent dtype == operand dtype, so an fp32-upcast
        # output breaks reverse-mode AD under bf16. MXU accumulation is fp32
        # internally regardless; the result is rounded to the compute dtype.
        y = jnp.dot(
            x.astype(self.dtype),
            (w * c).astype(self.dtype),
            precision=PRECISION,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.constant(self.bias_init), (self.features,))
            y = y + b * self.lr_mul
        return y.astype(self.dtype)


class EqualizedConv2d(nn.Module):
    """Same-padding conv with equalized LR (custom_layers.py:28-44). NHWC/HWIO."""

    features: int
    kernel_size: int
    stride: int = 1
    no_bias: bool = False
    lr_mul: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        in_features = x.shape[-1]
        w = self.param("weight", _equalized_init(self.lr_mul), (k, k, in_features, self.features))
        c = equalized_scale(in_features * k * k, self.lr_mul)
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            (w * c).astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=PRECISION,
        )
        if not self.no_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b * self.lr_mul
        return y.astype(self.dtype)
