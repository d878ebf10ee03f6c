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
from jax.ad_checkpoint import checkpoint_name

Dtype = Any

# fp32 inputs: force the true-fp32 algorithm (XLA CPU's default conv path is
# a low-precision oneDNN fast path; on TPU this selects the 6-pass bf16
# decomposition). bf16 inputs are unaffected — the MXU path is native.
PRECISION = jax.lax.Precision.HIGHEST

# Width-packed k=3/s=1 conv: at tiny output-channel counts the conv's lane
# dim wastes the MXU (Co=32 fills 32/128 lanes; measured ~12 TF/s at 1024²,
# tools/step_breakdown_probe). Re-blocking the SAME conv as a band-Toeplitz
# matmul packs p = 128//Co adjacent output pixels' channels onto lanes; the
# (p+2)/3 MAC inflation buys p× lane utilization. Only the D trunk's block-0
# conv0 at the 1024² recipe (c32→32 @1024²) sits in the win region —
# measured 1.81× on fwd+grad there, a wash at p=2, a loss below that and at
# small maps (tools/packconv_probe). Gated to p ≥ 4 AND large maps; the
# packed dw reduction also has a different (√p-noisier) accumulation order,
# which matters for the strict small-model DP==meshless equality tests.
PACKED_K3 = True
PACKED_K3_MAX_CO = 32  # pack only when p = 128//Co ≥ 4 (the measured win region)
PACKED_K3_MIN_RES = 512  # measured win is at huge maps; small maps lose
# Lanes to target when choosing the pack factor: p = LANE_TARGET//Co (≤ 8).
# p need not stop at one 128-lane tile — N = p·Co = 256 is just two lane
# tiles, and the r3 p-sweep measured p=8 > p=4 at c32 (2.0× vs 1.8× fwd+grad
# at 1024²; tools/packconv_probe). 256 also keeps the (p+2)/3 MAC inflation
# at ≤ 3.3×, below the measured lane-waste recovery.
PACKED_K3_LANE_TARGET = 256


def _pack_p(co: int, width: int) -> int:
    """Pack factor for a k=3 conv with ``co`` output channels on a ``width`` map.

    Widest p ≤ 8 with p·co ≈ PACKED_K3_LANE_TARGET lanes that divides the
    map width; halves until it does (flagship widths are powers of two, so
    this only fires on exotic shapes). Returns 1 when packing cannot reach
    two+ pixels per lane tile group.
    """
    p = min(8, max(1, PACKED_K3_LANE_TARGET // max(co, 1)))
    while p > 1 and width % p:
        p //= 2
    return p


def equalized_scale(fan_in: int, lr_mul: float = 1.0) -> float:
    """He-style runtime scale: 1/sqrt(fan_in) * lr_mul (custom_layers.py:10)."""
    return lr_mul / math.sqrt(fan_in)


def _equalized_init(lr_mul: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) / lr_mul

    return init


def _pack_conv3_rhs(w: jax.Array, p: int) -> jax.Array:
    """(3, 3, C, Co) → (3·(p+2)·C, p·Co) band-Toeplitz rhs.

    Output pixel q of a width-p group reads strip columns q..q+2, so
    rhs[(ky, q+kx, ci), (q, co)] = w[ky, kx, ci, co] and zero elsewhere.
    """
    k, _, c, co = w.shape
    rhs = jnp.zeros((k, p + 2, c, p, co), w.dtype)
    for q in range(p):
        rhs = rhs.at[:, q : q + 3, :, q, :].add(w)
    return rhs.reshape(k * (p + 2) * c, p * co)


def conv3x3_packed(x: jax.Array, w: jax.Array, p: int) -> jax.Array:
    """Exact k=3/s=1/same NHWC conv as a width-packed matmul.

    The input is re-blocked into W//p groups of p columns; each group's
    matmul lhs is the (3 row taps) × (p+2 column strip) × C patch — built
    from pad/reshape/concat only, no gathers — and the rhs is the
    band-Toeplitz weight of ``_pack_conv3_rhs``. Exact: the strip's two
    trailing columns come from the next group (zero-padded at the right
    edge), matching same-padding semantics (probe: rel err ≤ 2e-7 fp32).
    """
    b, h, wd, c = x.shape
    co = w.shape[-1]
    g = wd // p
    # rows: +1 both sides (same conv); cols: +1 left, +max(p-1, 1) right so
    # the "next two" strip columns reshape at stride p without overlap
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, max(p - 1, 1)), (0, 0)))
    own = xp[:, :, : g * p, :].reshape(b, h + 2, g, p * c)
    nxt2 = (
        xp[:, :, p : p + g * p, :]
        .reshape(b, h + 2, g, p, c)[:, :, :, :2, :]
        .reshape(b, h + 2, g, 2 * c)
    )
    strip = jnp.concatenate([own, nxt2], axis=-1)  # (B, H+2, G, (p+2)·C)
    xs = jnp.concatenate([strip[:, i : i + h] for i in range(3)], axis=-1)
    y = jax.lax.dot_general(
        xs,
        _pack_conv3_rhs(w, p),
        (((3,), (0,)), ((), ())),
        precision=PRECISION,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y.reshape(b, h, wd, co)


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
    # Optional jax.ad_checkpoint.checkpoint_name on the layer output —
    # identity unless an enclosing remat installs a save_only_these_names
    # policy matching it (see models/discriminator.py remat_save_d_convs).
    ckpt_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel_size
        in_features = x.shape[-1]
        w = self.param("weight", _equalized_init(self.lr_mul), (k, k, in_features, self.features))
        c = equalized_scale(in_features * k * k, self.lr_mul)
        pad = k // 2
        p = _pack_p(self.features, x.shape[2])
        if (
            PACKED_K3
            and k == 3
            and self.stride == 1
            and self.features <= PACKED_K3_MAX_CO
            and x.shape[1] >= PACKED_K3_MIN_RES
            and p >= 2
        ):
            y = conv3x3_packed(x.astype(self.dtype), (w * c).astype(self.dtype), p)
        else:
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
        y = y.astype(self.dtype)
        if self.ckpt_name is not None:
            y = checkpoint_name(y, self.ckpt_name)
        return y
