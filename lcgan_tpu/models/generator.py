"""LC-GAN Generator (cnn.py:46-115) — TPU-native Flax implementation.

Architecture parity (SURVEY.md §2.3):
  * dual mapping networks: geometry [geo_noise, geo_latent ×12], appearance
    [app_noise, app/4, app/2, app ×10] (cnn.py:66-75)
  * learned 4×4×512 const input (cnn.py:76)
  * num_blocks = log2(res) - 2 SynthesisBlocks; channels
    min(base_nf · 2^(num_blocks-i-1), 512) (cnn.py:79-84)
  * ToRGB consuming 2 appearance codes (cnn.py:87,114)
  * w-avg tracking + truncation trick (cnn.py:62-64, 94-101). The reference
    mutates registered buffers in forward; here the averages are an explicit
    Flax 'stats' collection threaded through apply (mutable in training),
    so they live in the train-state pytree and checkpoint/restore exactly.

Each SynthesisBlock (custom_layers.py:114-166) runs four branches:
skip (1×1 conv ×√.5 → nearest 2× → box filter), flow field (mod-conv up2 →
box filter → tanh), main (mod-conv up2 → box filter → lrelu×√2 → mod-conv →
lrelu → +skip), then a bicubic feature warp by coordinates + flow·scale.

TPU-first: NHWC, bf16 compute (fp32 params / fp32 MXU accumulation),
optional jax.checkpoint rematerialization per block for 1024² memory.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcgan_tpu.ops.equalized import EqualizedConv2d
from lcgan_tpu.ops.filters import box_filter_3x3, leaky_relu, nearest_upsample_2x
from lcgan_tpu.ops.grid_sample import (
    grid_sample_bicubic_banded,
    identity_like_coordinates,
    max_warp_displacement,
)
from lcgan_tpu.ops.warp_pallas import grid_sample_bicubic_pallas
from lcgan_tpu.ops.mapping import MappingNetwork
from lcgan_tpu.ops.modulated import SynthesisLayer

Dtype = Any

SQRT2 = math.sqrt(2.0)
SQRT_HALF = math.sqrt(0.5)


class SynthesisBlock(nn.Module):
    """Flow-warping synthesis block (custom_layers.py:114-166)."""

    features: int
    g_latent_dim: int
    a_latent_dim: int
    max_flow_scale: float
    use_noise: bool = False  # reaches the two main convs, never the flow layer
    warp_impl: str = "auto"  # auto | pallas (fused kernel) | banded (XLA)
    warp_pallas_min_res: int = 128  # below: banded scan (cheaper at small maps)
    warp_adaptive_band: bool = True  # half-band fast path sized by actual flow
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, g_latent: jax.Array, a_latents: jax.Array) -> jax.Array:
        # a_latents: (B, 2, a_dim) — two appearance codes per block (cnn.py:110)
        a0 = a_latents[:, 0]
        a1 = a_latents[:, 1]

        skip = EqualizedConv2d(
            features=self.features, kernel_size=1, no_bias=True, dtype=self.dtype, name="skip_layer"
        )(x)
        skip = skip * jnp.asarray(SQRT_HALF, skip.dtype)
        skip = box_filter_3x3(nearest_upsample_2x(skip))

        # ckpt_name marks each modulated conv's RAW output (pre-demod, see
        # ops/modulated.py) — identity unless the remat policy installed by
        # Generator.remat_save_g_convs matches. With the three conv results
        # saved, the remat backward drops the conv forwards entirely: every
        # residual it needs (demod grad, lrelu masks, tanh, the warp VJP's
        # input-only residuals) rebuilds with cheap elementwise work.
        flow = SynthesisLayer(
            features=2, latent_dim=self.g_latent_dim, up=2, dtype=self.dtype,
            ckpt_name="g_conv_out", name="flow_layer"
        )(x, g_latent)
        flow = jnp.tanh(box_filter_3x3(flow).astype(jnp.float32))

        y = SynthesisLayer(
            features=self.features,
            latent_dim=self.a_latent_dim,
            up=2,
            use_noise=self.use_noise,
            dtype=self.dtype,
            ckpt_name="g_conv_out",
            name="modulated_conv0",
        )(x, a0)
        y = leaky_relu(box_filter_3x3(y), 0.2, SQRT2)
        y = SynthesisLayer(
            features=self.features,
            latent_dim=self.a_latent_dim,
            up=1,
            use_noise=self.use_noise,
            dtype=self.dtype,
            ckpt_name="g_conv_out",
            name="modulated_conv1",
        )(y, a1)
        y = leaky_relu(y, 0.2)
        y = skip + y

        # feature warping (custom_layers.py:162-165). The tanh-bounded flow
        # makes the warp displacement-bounded, so the banded MXU formulation
        # applies (gather-free; see ops/grid_sample.py).
        b, h, w, _ = y.shape
        coords = identity_like_coordinates(b, h, w)
        correspondence = coords + flow * self.max_flow_scale
        max_disp = max_warp_displacement(h, self.max_flow_scale)
        use_pallas = self.warp_impl == "pallas" or (
            self.warp_impl == "auto"
            and jax.default_backend() == "tpu"
            and h >= self.warp_pallas_min_res
        )
        if self.warp_impl == "none":  # diagnostic only: skip the warp
            warped = y
        elif use_pallas:
            # warp_adaptive_band: per-row tap-exact band windows derived
            # in-kernel from the flow itself (ops/warp_pallas._dyn_window) —
            # work scales with the actual tap spread, not the tanh bound;
            # off = static worst-case bands (diagnostic/A-B baseline)
            warped = grid_sample_bicubic_pallas(
                y, correspondence, max_disp, dyn=self.warp_adaptive_band
            )
        else:
            warped = grid_sample_bicubic_banded(y, correspondence, max_disp)
        return warped.astype(self.dtype)


class ToRGBBlock(nn.Module):
    """mod-conv 3×3 → lrelu → mod-conv 1×1 to RGB (custom_layers.py:169-182)."""

    features: int
    a_latent_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, a_latents: jax.Array) -> jax.Array:
        x = SynthesisLayer(
            features=x.shape[-1],
            latent_dim=self.a_latent_dim,
            kernel_size=3,
            dtype=self.dtype,
            name="modulated_conv0",
        )(x, a_latents[:, 0])
        x = leaky_relu(x, 0.2)
        x = SynthesisLayer(
            features=self.features,
            latent_dim=self.a_latent_dim,
            kernel_size=1,
            dtype=self.dtype,
            name="modulated_conv1",
        )(x, a_latents[:, 1])
        return x


class Generator(nn.Module):
    """Dual-mapping flow-warp generator (cnn.py:46-115).

    ``w_psi`` semantics (cnn.py:94-101): w_psi <= 0 (training) updates the
    running w averages (stats collection, needs ``mutable=['stats']``);
    w_psi > 0 lerps codes toward the averages (truncation at inference).
    ``mean_axis`` optionally pmean's the batch-mean across a named mesh axis
    so the averages stay replica-consistent (fixes the reference's per-rank
    drift under broadcast_buffers=False, worker.py:90).
    """

    img_resolution: int
    geo_noise_dim: int = 64
    app_noise_dim: int = 64
    geo_latent_dim: int = 64
    app_latent_dim: int = 512
    max_flow_scale: float = 0.1
    base_nf: Optional[int] = None
    max_nf: int = 512
    img_ch: int = 3
    w_avg_beta: float = 0.998
    use_noise: bool = False  # the reference disables it everywhere (cnn.py:83,87)
    remat: bool = False
    # With remat on, additionally SAVE each block's three modulated-conv
    # outputs (the "g_conv_out" named checkpoints) instead of recomputing the
    # convs in the backward — trades ~2 block-sized tensors of memory per
    # block for dropping the conv forwards from the recompute. Algebraically
    # identical grads (fp reassociation only; tested). Applied only to blocks
    # whose output map is <= remat_save_max_res (a relief valve for
    # HBM-constrained deployments; at the default 1024 every flagship block
    # uses the policy — the r3 compile-blowup fear did not reproduce on
    # re-measurement, and the r5 full-step 1024²/b2 memory check passed).
    remat_save_g_convs: bool = False
    remat_save_max_res: int = 1024
    warp_impl: str = "auto"
    warp_pallas_min_res: int = 128
    warp_adaptive_band: bool = True
    dtype: Dtype = jnp.float32

    @property
    def num_blocks(self) -> int:
        return int(math.log2(self.img_resolution)) - 2

    @property
    def resolved_base_nf(self) -> int:
        if self.base_nf is not None:
            return self.base_nf
        return 32 if self.img_resolution == 1024 else 64 if self.img_resolution == 512 else 128

    @nn.compact
    def __call__(
        self,
        rand_noise1: jax.Array,  # (B, geo_noise_dim)
        rand_noise2: jax.Array,  # (B, app_noise_dim)
        w_psi: float = -1.0,
        mean_axis: Optional[str] = None,
        num_views: int = 1,
    ) -> jax.Array:
        """``num_views > 1``: the batch is that many independent view-batches
        stacked along axis 0 (the train step's batched form of the
        reference's separate even-iteration G calls, worker.py:193-205).
        Everything is per-sample except the w-avg buffer update, which
        replays the same per-view sequential lerps the separate calls
        perform — identical final stats, one fused forward."""
        geometry_channels = [self.geo_noise_dim] + [self.geo_latent_dim] * 12
        appearance_channels = [
            self.app_noise_dim,
            self.app_latent_dim // 4,
            self.app_latent_dim // 2,
        ] + [self.app_latent_dim] * 10

        geometry_code = MappingNetwork(geometry_channels, name="geometry_mapping")(rand_noise1)
        appearance_code = MappingNetwork(appearance_channels, name="appearance_mapping")(rand_noise2)

        avg1 = self.variable("stats", "avg_latent1", jnp.zeros, (self.geo_latent_dim,))
        avg2 = self.variable("stats", "avg_latent2", jnp.zeros, (self.app_latent_dim,))

        if w_psi <= 0:
            # new_avg = mean(w).lerp(avg, beta) = (1-beta)*mean(w) + beta*avg
            # num_views > 1: one lerp per view, in stacking order — the same
            # op sequence as separate per-view forwards (cnn.py:96-97).
            for v in range(num_views):
                sl = slice(None) if num_views == 1 else slice(v * (rand_noise1.shape[0] // num_views), (v + 1) * (rand_noise1.shape[0] // num_views))
                m1 = jax.lax.stop_gradient(jnp.mean(geometry_code[sl], axis=0))
                m2 = jax.lax.stop_gradient(jnp.mean(appearance_code[sl], axis=0))
                if mean_axis is not None:
                    m1 = jax.lax.pmean(m1, mean_axis)
                    m2 = jax.lax.pmean(m2, mean_axis)
                if not self.is_initializing():
                    avg1.value = m1 + self.w_avg_beta * (avg1.value - m1)
                    avg2.value = m2 + self.w_avg_beta * (avg2.value - m2)
        else:
            # avg.lerp(code, psi) = avg + psi*(code - avg)
            geometry_code = avg1.value + w_psi * (geometry_code - avg1.value)
            appearance_code = avg2.value + w_psi * (appearance_code - avg2.value)

        batch = rand_noise1.shape[0]
        const = self.param(
            "const",
            nn.initializers.normal(1.0),
            (4, 4, self.max_nf),  # HWC; torch stores CHW (cnn.py:76)
        )
        x = jnp.broadcast_to(const[None].astype(self.dtype), (batch, 4, 4, self.max_nf))

        nb = self.num_blocks
        base_nf = self.resolved_base_nf
        a_pair = jnp.stack([appearance_code, appearance_code], axis=1)  # (B,2,a_dim)
        save_policy = jax.checkpoint_policies.save_only_these_names("g_conv_out")
        for i in range(nb):
            out_features = min(base_nf * 2 ** (nb - i - 1), self.max_nf)
            out_res = 8 * 2**i  # block i upsamples 4·2^i → 8·2^i
            if self.remat:
                use_save = self.remat_save_g_convs and out_res <= self.remat_save_max_res
                block_cls = nn.remat(SynthesisBlock, policy=save_policy if use_save else None)
            else:
                block_cls = SynthesisBlock
            x = block_cls(
                features=out_features,
                g_latent_dim=self.geo_latent_dim,
                a_latent_dim=self.app_latent_dim,
                max_flow_scale=self.max_flow_scale,
                use_noise=self.use_noise,
                warp_impl=self.warp_impl,
                warp_pallas_min_res=self.warp_pallas_min_res,
                warp_adaptive_band=self.warp_adaptive_band,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, geometry_code, a_pair)

        rgb_cls = nn.remat(ToRGBBlock) if self.remat else ToRGBBlock
        out = rgb_cls(
            features=self.img_ch, a_latent_dim=self.app_latent_dim, dtype=self.dtype, name="rgb_layer"
        )(x, a_pair)
        return out
