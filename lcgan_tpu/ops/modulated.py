"""Modulated (StyleGAN2 mod/demod) convolution, TPU-native formulation.

The reference (custom_layers.py:47-86) builds a per-sample weight tensor and
runs a grouped conv with ``groups = batch`` — a pattern that maps terribly to
XLA/TPU (it forces either a huge reshaped conv or per-sample dispatch).

Because convolution is linear in each input channel, modulation and
demodulation commute with the conv:

    y[b,o] = conv(x[b] * s[b,:], W)[o] * d[b,o] + bias[o]
    d[b,o] = rsqrt( sum_i s[b,i]^2 * ||W[:,:,i,o]||^2 + eps )

which is *algebraically identical* to the reference's per-sample weights
(custom_layers.py:62-68) but runs as ONE shared-weight convolution on the MXU
plus two cheap elementwise scalings that XLA fuses into the conv's prologue/
epilogue. The demod norm reduces to a (B,I)x(I,O) matmul.

The ``up=2`` path reproduces torch ``conv_transpose2d(stride=2,
padding=(k-1)//2, output_padding=1)`` geometry (custom_layers.py:74-80) as
a direct conv over an lhs-dilated input with a flipped kernel. An exact
four-phase decomposition (:func:`_up2_phases`, 9 MACs/input pixel vs 36
naive) is kept behind ``UP2_PHASES`` — faster in isolation at every block
size but measurably slower composed into the rematerialized train step
(see the switch's comment for the numbers).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from lcgan_tpu.ops.equalized import PRECISION, EqualizedLinear, _equalized_init, equalized_scale

Dtype = Any

# Trace-time A/B switches for the k=3 up-conv formulation (tools/upconv_probe.py
# and step-breakdown probes flip them). Isolated op timings favor the phase
# decomposition at EVERY block size (1.2-1.7x, tools/upconv_probe.py), but
# IN-STEP — under block remat and the dynamic-band warp — the dilated form
# wins at every flagship resolution (G grad, dyn band: 256^2 110.8 dilated
# vs 116.3 phases / 114.4 gated-at->=128; 512^2 163.8 vs 175.7-177.5;
# 1024^2 312.0 vs 337.4-338.1): the phase path's stack/reshape interleaves
# cost more in recompute+fusion context than the 4x MAC saving buys once
# the warp no longer dominates. Default OFF; kept as a measured negative
# with the probe so the conclusion is reproducible.
UP2_PHASES = False
UP2_PHASES_MIN_RES = 128


def _up2_phases(xs: jax.Array, w_t: jax.Array) -> jax.Array:
    """k=3 transposed conv (s=2, p=1, op=1) as four phase convs, interleaved.

    Output row o = 2i of the transpose touches dilated taps {2i-1, 2i, 2i+1},
    of which only 2i holds data: y[2i] = w_t[1] x[i]. Row o = 2i+1 touches
    {2i, 2i+2}: y[2i+1] = w_t[0] x[i] + w_t[2] x[i+1], where x[H] reads as
    zero (that zero IS output_padding=1). The decomposition is separable, so
    the four 2-D phases use tap sets {1}x{1}, {1}x{0,2}, {0,2}x{1},
    {0,2}x{0,2} — 9 MACs per INPUT pixel total vs 36 for the naive dilated
    form. Exactly equal to the dilated evaluation (same taps, same sums).
    ``w_t`` is the spatially flipped kernel.
    """
    b, h, wd, _ = xs.shape
    o = w_t.shape[-1]

    def conv(kern, pads):
        return jax.lax.conv_general_dilated(
            xs,
            kern,
            window_strides=(1, 1),
            padding=pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=PRECISION,
        )

    ee = conv(w_t[1:2, 1:2], ((0, 0), (0, 0)))
    eo = conv(w_t[1:2, 0::2], ((0, 0), (0, 1)))
    oe = conv(w_t[0::2, 1:2], ((0, 1), (0, 0)))
    oo = conv(w_t[0::2, 0::2], ((0, 1), (0, 1)))
    rows_e = jnp.stack([ee, eo], axis=3).reshape(b, h, 2 * wd, o)
    rows_o = jnp.stack([oe, oo], axis=3).reshape(b, h, 2 * wd, o)
    return jnp.stack([rows_e, rows_o], axis=2).reshape(b, 2 * h, 2 * wd, o)


def modulated_conv2d(
    x: jax.Array,  # (B, H, W, I)
    styles: jax.Array,  # (B, I)
    weight: jax.Array,  # (k, k, I, O), already equalized-scaled, fp32
    bias: jax.Array,  # (O,), already lr_mul-scaled, fp32
    *,
    up: int = 1,
    eps: float = 1e-8,
    dtype: Dtype = jnp.float32,
    ckpt_name: Optional[str] = None,
) -> jax.Array:
    """Functional mod/demod conv. See module docstring for the rewrite.

    ``ckpt_name`` attaches a ``checkpoint_name`` to the RAW conv output,
    before the demod/bias epilogue (identity unless a matching
    ``jax.checkpoint`` policy is installed). It must sit pre-demod: the
    demod coefficient's own gradient needs the raw conv result as a
    residual (d/d demod = Σ g·conv_raw), so naming a post-demod value
    would pin the conv forward in the remat backward anyway.
    """
    k = weight.shape[0]
    pad = (k - 1) // 2

    # Demodulation coefficient: d[b,o] = rsqrt(sum_i s^2[b,i] * wsq[i,o] + eps).
    wsq = jnp.sum(jnp.square(weight), axis=(0, 1))  # (I, O), fp32
    sigma = jnp.dot(
        jnp.square(styles.astype(jnp.float32)), wsq,
        preferred_element_type=jnp.float32, precision=PRECISION,
    )
    demod = jax.lax.rsqrt(sigma + eps)  # (B, O)

    xs = x.astype(dtype) * styles.astype(dtype)[:, None, None, :]
    if up == 1:
        # NOTE: the width-packed matmul form (ops/equalized.conv3x3_packed)
        # was A/B'd here for the 1024² top-block c32 convs and LOSES in-step
        # (G grad 312 → 338 ms, G fwd 76 → 87): inside the rematerialized
        # synthesis blocks the pack's pad/reshape/concat lhs build schedules
        # worse than the lane waste it removes — unlike D's trunk, where the
        # same rewrite wins 1.81× (see ops/equalized.py). Measured negative;
        # keep the plain conv.
        y = jax.lax.conv_general_dilated(
            xs,
            weight.astype(dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=PRECISION,
        )
    else:
        # torch conv_transpose2d(stride=up, padding=pad, output_padding=1)
        # (custom_layers.py:74-80; output size = up*H exactly).
        assert up == 2, "reference only uses up in {1, 2}"
        w_t = jnp.flip(weight, axis=(0, 1)).astype(dtype)
        if k == 3 and UP2_PHASES and x.shape[1] >= UP2_PHASES_MIN_RES:
            y = _up2_phases(xs, w_t)
        else:
            # generic fallback: direct conv over an lhs-dilated input
            lo, hi = k - 1 - pad, k - pad  # output_padding=1 adds one hi-side
            y = jax.lax.conv_general_dilated(
                xs,
                w_t,
                window_strides=(1, 1),
                padding=((lo, hi), (lo, hi)),
                lhs_dilation=(up, up),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=PRECISION,
            )
    if ckpt_name is not None:
        y = checkpoint_name(y, ckpt_name)
    # epilogue in the compute dtype: an fp32 demod multiply would materialize
    # an fp32 copy of the (dominant) activation tensor under bf16 training
    y = y * demod.astype(y.dtype)[:, None, None, :] + bias.astype(y.dtype)
    return y.astype(dtype)


class ModulatedConv2d(nn.Module):
    """StyleGAN2 mod/demod conv module (custom_layers.py:47-86)."""

    features: int
    kernel_size: int
    up: int = 1
    eps: float = 1e-8
    lr_mul: float = 1.0
    dtype: Dtype = jnp.float32
    ckpt_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        k = self.kernel_size
        in_features = x.shape[-1]
        w = self.param("weight", _equalized_init(self.lr_mul), (k, k, in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        c = equalized_scale(in_features * k * k, self.lr_mul)
        return modulated_conv2d(
            x,
            s,
            (w * c).astype(jnp.float32),
            (b * self.lr_mul).astype(jnp.float32),
            up=self.up,
            eps=self.eps,
            dtype=self.dtype,
            ckpt_name=self.ckpt_name,
        )


class SynthesisLayer(nn.Module):
    """Style affine + modulated conv + optional fixed-noise add
    (custom_layers.py:89-111).

    ``use_noise`` (off everywhere in the reference, cnn.py:83,87) adds a
    per-layer FIXED noise image scaled by a learned scalar and a 0.01 gain
    (custom_layers.py:99-101,106-108). The noise image is a buffer, not a
    parameter — it lives in the 'stats' collection (like the w-avg buffers)
    so it is checkpointed and EMA-copied but never trained.
    """

    features: int
    latent_dim: int  # kept for interface parity; inferred from the latent
    kernel_size: int = 3
    up: int = 1
    lr_mul: float = 1.0
    use_noise: bool = False
    dtype: Dtype = jnp.float32
    ckpt_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, latent: jax.Array) -> jax.Array:
        # style = EqualizedLinear(latent -> in_features, bias init 1.0)
        s = EqualizedLinear(
            features=x.shape[-1], bias_init=1.0, lr_mul=1.0, dtype=jnp.float32, name="linear"
        )(latent)
        y = ModulatedConv2d(
            features=self.features,
            kernel_size=self.kernel_size,
            up=self.up,
            lr_mul=1.0,
            dtype=self.dtype,
            ckpt_name=self.ckpt_name,
            name="modulated_conv",
        )(x, s)
        if self.use_noise:
            noise_gain = 0.01  # custom_layers.py:99
            strength = self.param("noise_strength", nn.initializers.zeros, ())
            res_h, res_w = y.shape[1], y.shape[2]
            const = self.variable(
                "stats",
                "noise_const",
                lambda: jax.random.normal(self.make_rng("params"), (res_h, res_w), jnp.float32),
            )
            noise = const.value * strength * noise_gain
            y = y + noise.astype(y.dtype)[None, :, :, None]
        return y
