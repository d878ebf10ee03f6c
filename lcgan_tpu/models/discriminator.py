"""LC-GAN Discriminator (cnn.py:7-43) — TPU-native Flax implementation.

Parity (SURVEY.md §2.3):
  * 1×1 fromRGB conv + LeakyReLU, then N residual DiscriminatorBlocks with
    channels min(base_nf·2^i, 512) → min(base_nf·2^(i+1), 512) (cnn.py:19-27)
  * mbstd(group 8) epilogue → conv 3×3 → lrelu → EqualizedLinear(512·16→512,
    lr_mul=0.01) → lrelu (custom_layers.py:220-234, cnn.py:28)
  * logit head (ProjectionHead [512, 1]) plus two L2-normalized projection
    heads over the flattened 4×4 features (cnn.py:29-31, 38-41)

freezeD semantics (worker.py:127-131): freezing "the first n+2 children of
shared_model" == fromRGB conv + first n DiscriminatorBlocks (the +2 offset
skips the parameterless LeakyReLU). In this implementation, that maps to
param sub-trees {from_rgb, block_0..block_{n-1}} — see train/freeze.py.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcgan_tpu.ops.equalized import EqualizedConv2d, EqualizedLinear
from lcgan_tpu.ops.filters import avg_pool_2x2, box_filter_3x3, leaky_relu
from lcgan_tpu.ops.mapping import ProjectionHead
from lcgan_tpu.ops.mbstd import minibatch_stddev

Dtype = Any

SQRT2 = math.sqrt(2.0)
SQRT_HALF = math.sqrt(0.5)


class DiscriminatorBlock(nn.Module):
    """Residual downsampling block (custom_layers.py:185-217), skip=True form.

    ``save_convs``: name the two trunk conv outputs as "d_conv_out"
    checkpoints. Under the remat policy installed by
    ``Discriminator.remat_save_d_convs`` the block backward then rebuilds
    everything it needs (lrelu masks, the box filter, the skip pool) from
    the SAVED conv results with elementwise/shift work only — the conv
    forwards drop out of the recompute, exactly the G-side savewarp trick
    (models/generator.py). The skip 1×1 stays unnamed: nothing in the
    backward needs its value (the residual add is linear and its dw reads
    pool(x), recomputed from the block input), so its recompute is DCE'd.
    """

    features: int
    dtype: Dtype = jnp.float32
    save_convs: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ckpt = "d_conv_out" if self.save_convs else None
        skip = avg_pool_2x2(x)
        skip = EqualizedConv2d(
            features=self.features, kernel_size=1, no_bias=True, dtype=self.dtype, name="skip_layer"
        )(skip)
        skip = skip * jnp.asarray(SQRT_HALF, skip.dtype)

        y = EqualizedConv2d(
            features=x.shape[-1], kernel_size=3, dtype=self.dtype, ckpt_name=ckpt, name="conv0"
        )(x)
        y = leaky_relu(y, 0.2, SQRT2)
        y = box_filter_3x3(y)
        y = EqualizedConv2d(
            features=self.features, kernel_size=3, stride=2, dtype=self.dtype, ckpt_name=ckpt,
            name="conv1",
        )(y)
        y = leaky_relu(y, 0.2)
        return skip + y


class DiscriminatorEpilogue(nn.Module):
    """mbstd → conv 3×3 → lrelu → linear → lrelu (custom_layers.py:220-234)."""

    features: int
    mbstd_group_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, num_views: int = 1) -> jax.Array:
        x = minibatch_stddev(x, group_size=self.mbstd_group_size, num_views=num_views)
        x = EqualizedConv2d(features=self.features, kernel_size=3, dtype=self.dtype, name="conv")(x)
        x = leaky_relu(x, 0.2)
        # torch flattens NCHW row-major: (C, H, W); transpose NHWC to match so
        # converted checkpoints would line up with the linear's weight order.
        n, h, w, c = x.shape
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c * h * w)
        x = EqualizedLinear(features=self.features, lr_mul=0.01, dtype=self.dtype, name="linear")(x)
        return leaky_relu(x, 0.2)


class Discriminator(nn.Module):
    """Shared trunk + logit head + geometry/appearance projection heads."""

    img_resolution: int
    geo_projection_dim: int = 256
    app_projection_dim: int = 256
    base_nf: Optional[int] = None
    max_nf: int = 512
    mbstd_group_size: int = 8
    remat: bool = False
    # With remat on, additionally SAVE each block's two trunk conv outputs
    # ("d_conv_out" checkpoints) so the remat backward skips the conv
    # recompute — see DiscriminatorBlock.save_convs. Gated per block to
    # input maps <= remat_save_max_res (same compile/memory guard as the
    # G-side policy, models/generator.py).
    remat_save_d_convs: bool = False
    remat_save_max_res: int = 1024
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
        self, image: jax.Array, get_embedding_features: bool = False, num_views: int = 1
    ) -> Tuple[jax.Array, Optional[jax.Array], Optional[jax.Array]]:
        """``num_views``: image is that many independent view-batches stacked
        along the batch axis (see ops/mbstd.py) — everything here is
        per-sample except mbstd, which gets the view count."""
        base_nf = self.resolved_base_nf
        x = EqualizedConv2d(features=base_nf, kernel_size=1, dtype=self.dtype, name="from_rgb")(
            image.astype(self.dtype)
        )
        x = leaky_relu(x, 0.2)
        out_features = base_nf
        save_policy = jax.checkpoint_policies.save_only_these_names("d_conv_out")
        for i in range(self.num_blocks):
            out_features = min(base_nf * 2 ** (i + 1), self.max_nf)
            in_res = self.img_resolution // (2**i)
            use_save = (
                self.remat and self.remat_save_d_convs and in_res <= self.remat_save_max_res
            )
            if self.remat:
                block_cls = nn.remat(
                    DiscriminatorBlock, policy=save_policy if use_save else None
                )
            else:
                block_cls = DiscriminatorBlock
            x = block_cls(
                features=out_features, dtype=self.dtype, save_convs=use_save, name=f"block_{i}"
            )(x)

        h = x  # (B, 4, 4, out_features)
        feat = DiscriminatorEpilogue(
            features=out_features,
            mbstd_group_size=self.mbstd_group_size,
            dtype=self.dtype,
            name="discriminator_epilogue",
        )(h, num_views)
        logit = ProjectionHead([out_features, 1], dtype=self.dtype, name="logit_mapper")(feat)

        geometry_embedding = None
        appearance_embedding = None
        if get_embedding_features:
            n, hh, ww, c = h.shape
            flat = jnp.transpose(h, (0, 3, 1, 2)).reshape(n, c * hh * ww)
            geo = ProjectionHead(
                [out_features * 16, out_features * 4, out_features, self.geo_projection_dim],
                dtype=self.dtype,
                name="projection_header1",
            )(flat)
            app = ProjectionHead(
                [out_features * 16, out_features * 4, out_features, self.app_projection_dim],
                dtype=self.dtype,
                name="projection_header2",
            )(flat)
            geometry_embedding = _l2_normalize(geo)
            appearance_embedding = _l2_normalize(app)
        return logit, geometry_embedding, appearance_embedding


def _l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize(p=2, dim=1) semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)
