"""Bicubic grid sampling (feature warping) for TPU.

Parity target: torch ``F.grid_sample(x, grid, mode='bicubic',
padding_mode='zeros', align_corners=False)`` as used by the flow-warp in
every synthesis block (custom_layers.py:162-165).

There is no XLA primitive for this. This implementation expresses the warp
as 16 weighted gathers over the flattened spatial axis (one per bicubic tap)
— differentiable w.r.t. both the features (gather → scatter-add in the VJP)
and the sampling grid (through the cubic weights, which is exactly the
derivative of the piecewise-cubic interpolant, matching torch's backward).

Coordinates use the align_corners=False unnormalization
``ix = ((gx + 1) * W - 1) / 2`` and the cubic convolution kernel with
A = -0.75 (torch's UpSample.h convention). Out-of-bounds taps contribute
zero (padding_mode='zeros').

Interpolation is done in fp32 regardless of the feature dtype — the
reference also casts to fp32 before warping (custom_layers.py:163-164).

This module holds the XLA formulations (gather, patch-gather, banded
matmul); they serve as the reference implementations and VJP oracles for
the fused Pallas kernel in lcgan_tpu.ops.warp_pallas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_A = -0.75  # torch cubic convolution constant


def _cubic_w(t: jax.Array):
    """4 bicubic tap weights for fractional offset t in [0,1)."""

    def near(x):  # |x| <= 1
        return ((_A + 2.0) * x - (_A + 3.0)) * x * x + 1.0

    def far(x):  # 1 < |x| < 2
        return ((_A * x - 5.0 * _A) * x + 8.0 * _A) * x - 4.0 * _A

    return far(t + 1.0), near(t), near(1.0 - t), far(2.0 - t)


def _kernel_at(t: jax.Array) -> jax.Array:
    """Cubic convolution kernel K(t) with A=-0.75, zero outside |t| < 2."""
    a = jnp.abs(t)
    near = ((_A + 2.0) * a - (_A + 3.0)) * a * a + 1.0
    far = ((_A * a - 5.0 * _A) * a + 8.0 * _A) * a - 4.0 * _A
    return jnp.where(a <= 1.0, near, jnp.where(a < 2.0, far, 0.0))


def grid_sample_bicubic_patch(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Patch-gather formulation: one (4,4,C) dynamic-slice per output pixel.

    Mathematically identical to :func:`grid_sample_bicubic` (same cubic
    kernel, align_corners=False, zeros padding) but fetches each pixel's
    16 taps as ONE contiguous 4×4×C patch — a single XLA gather of strided
    slices instead of 16 flat gathers, which is the difference between 1 and
    16 passes over HBM on TPU.

    Border handling: the patch start is clamped to [0, size-4]; the cubic
    weight of each tap is computed from its *absolute* position, and K(t)=0
    for |t| >= 2 makes shifted-in taps vanish — exactly zeros padding, since
    out-of-image taps contribute nothing. Requires H, W >= 4.
    """
    b, h, w, c = x.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    fx = ((gx + 1.0) * w - 1.0) * 0.5
    fy = ((gy + 1.0) * h - 1.0) * 0.5

    sy = jnp.clip(jnp.floor(fy).astype(jnp.int32) - 1, 0, h - 4)
    sx = jnp.clip(jnp.floor(fx).astype(jnp.int32) - 1, 0, w - 4)

    bg, hg, wg = gx.shape
    n = hg * wg
    interp_dtype = jnp.float32 if x.dtype in (jnp.float32, jnp.float64) else x.dtype
    xf = x.astype(interp_dtype)

    def patch(im, iy, ix):
        return jax.lax.dynamic_slice(im, (iy, ix, 0), (4, 4, c))

    patches = jax.vmap(jax.vmap(patch, in_axes=(None, 0, 0)))(
        xf, sy.reshape(bg, n), sx.reshape(bg, n)
    )  # (B, N, 4, 4, C)

    offs = jnp.arange(4, dtype=jnp.float32)
    wy = _kernel_at(fy.reshape(bg, n)[..., None] - (sy.reshape(bg, n).astype(jnp.float32)[..., None] + offs))
    wx = _kernel_at(fx.reshape(bg, n)[..., None] - (sx.reshape(bg, n).astype(jnp.float32)[..., None] + offs))
    # zeros padding falls out of the weighting: intended taps that are
    # off-image never appear in the clamped patch, and the shifted-in taps
    # that replace them sit at |t| >= 2 where K(t) = 0.
    out = jnp.einsum(
        "bnmkc,bnm,bnk->bnc",
        patches,
        wy.astype(interp_dtype),
        wx.astype(interp_dtype),
    )
    return out.reshape(bg, hg, wg, c).astype(x.dtype)


def grid_sample_bicubic_banded(x: jax.Array, grid: jax.Array, max_disp: int) -> jax.Array:
    """Bicubic warp for displacement-bounded grids, as MXU matmuls.

    TPU gathers/scatters are catastrophically slow for this op (measured
    ~240 ms fwd / ~500 ms bwd per synthesis-block warp at 256²·128ch on a
    v5e, vs ~6 ms for the block's conv). LC-GAN's warp is displacement-
    bounded: the sample position differs from the output position by at
    most ``max_disp`` pixels (tanh-bounded flow × max_flow_scale plus the
    align_corners mismatch, custom_layers.py:149-165). That turns the warp
    into a *banded* linear operator, evaluated densely on the MXU:

        out[l, c] = Σ_j Ay[l, j] · ( Σ_s Ax[l, s] · X[j, s, c] )

    where j runs over the 2M+1 y-band, s over a per-tile x-window, and
    Ay/Ax are the cubic kernel evaluated at ALL band positions — K(t) = 0
    outside |t| < 2 makes the dense evaluation exact. The inner contraction
    is a batched (TL × S) @ (S × C) matmul per band row; its transpose
    (the backward) is the same matmuls again — no scatter anywhere, and
    jax autodiff handles it.

    Zeros padding falls out of padding x with M zeros per side: out-of-
    frame taps multiply stored zeros. Identical results to
    :func:`grid_sample_bicubic` (same kernel, same unnormalization) for
    grids satisfying the displacement bound; ~10× cheaper fwd+bwd on TPU
    despite doing ~30× the FLOPs of a sparse gather — MXU beats gather.
    """
    b, h, w, c = x.shape
    m = int(max_disp)
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    fx = ((gx + 1.0) * w - 1.0) * 0.5  # (B,H,W) absolute sample cols
    fy = ((gy + 1.0) * h - 1.0) * 0.5

    interp_dtype = jnp.float32 if x.dtype in (jnp.float32, jnp.float64) else x.dtype
    prec = jax.lax.Precision.HIGHEST if interp_dtype == jnp.float32 else None

    # pad so every band/window index is in range; padded zeros implement
    # padding_mode='zeros' exactly (their contributions vanish).
    xp = jnp.pad(x.astype(interp_dtype), ((0, 0), (m, m), (m, m), (0, 0)))
    band = 2 * m + 1

    # x-direction tiling: TL output cols per tile, window S = TL + 2M.
    # Per-pixel FLOPs scale with S, so smaller tiles cut waste; TL=64 beat
    # 128/32 on v5e (86.7 vs 106/95.5 ms fwd+bwd at 256²×128ch×b8).
    tl = min(64, w)
    if w % tl:
        # A partial last tile would make the fixed-size dynamic_slice below
        # clamp its start and silently mismatch the precomputed `cols`
        # weights — fail loudly instead (model resolutions are powers of 2).
        raise ValueError(f"banded warp requires W % {tl} == 0, got W={w}")
    num_tiles = (w + tl - 1) // tl
    s_win = tl + 2 * m

    # y-band weights are computed per scan step from fy (materializing the
    # full (B,H,W,band) tensor costs 457M at 1024² — it OOMs the step)
    row_idx = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # (1,H,1)

    # Ax per tile: weight of window col s (absolute col t*TL - M + s) at (h,l)
    out = jnp.zeros((b, h, w, c), interp_dtype)
    for t in range(num_tiles):
        l0 = t * tl
        l1 = min(l0 + tl, w)
        cols = jnp.arange(s_win, dtype=jnp.float32) + (l0 - m)
        axw = _kernel_at(fx[:, :, l0:l1, None] - cols[None, None, None, :])
        axw = axw.astype(interp_dtype)  # (B,H,TLt,S)

        # lax.scan over the band keeps the graph size independent of M
        # (unrolling 2M+1 einsums per tile per block blows up compilation at
        # 512²+). jax.checkpoint on the body stops scan-AD from saving a
        # full-map slice per step (band × feature-map residuals OOM the
        # compile otherwise); the backward recomputes the slice + matmul.
        fy_t = fy[:, :, l0:l1]

        @jax.checkpoint
        def band_step(acc, jo):
            # rows h-M+jo of x == rows h+jo of xp; cols [l0..l0+S) of xp
            xjs = jax.lax.dynamic_slice(xp, (0, jo, l0, 0), (b, h, s_win, c))
            z = jnp.einsum("bhls,bhsc->bhlc", axw, xjs, precision=prec)
            # cubic weight of band row jo (absolute row h - M + jo) at (h,l)
            ayj = _kernel_at(fy_t - (row_idx + jo.astype(jnp.float32) - m))
            return acc + ayj.astype(interp_dtype)[..., None] * z, None

        acc = jnp.zeros((b, h, l1 - l0, c), interp_dtype)
        acc, _ = jax.lax.scan(band_step, acc, jnp.arange(band))
        out = out.at[:, :, l0:l1, :].set(acc)
    return out.astype(x.dtype)


def max_warp_displacement(size: int, max_flow_scale: float) -> int:
    """Static displacement bound for the synthesis-block warp.

    |sample_pos - out_pos| <= align_corners mismatch (0.5) + tanh-bounded
    flow (max_flow_scale · size/2), plus the 2-tap cubic support.
    """
    import math

    return int(math.ceil(0.5 + max_flow_scale * size / 2.0 + 2.0))


def grid_sample_bicubic(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample ``x`` (B,H,W,C) at ``grid`` (B,Hg,Wg,2) [x,y in [-1,1]].

    Interpolation runs in fp32 for fp32/fp64 features (matching the
    reference's fp32 cast, custom_layers.py:163-164) and in bf16 for bf16
    features — the fp32 upcast would double the dominant activation
    tensors of the whole model; index/weight math stays fp32 either way.
    """
    b, h, w, c = x.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # align_corners=False unnormalization
    fx = ((gx + 1.0) * w - 1.0) * 0.5
    fy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    wx = _cubic_w(tx)  # 4 × (B,Hg,Wg)
    wy = _cubic_w(ty)

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    interp_dtype = jnp.float32 if x.dtype in (jnp.float32, jnp.float64) else x.dtype
    flat = x.astype(interp_dtype).reshape(b, h * w, c)
    bg, hg, wg = gx.shape
    out = jnp.zeros((bg, hg, wg, c), interp_dtype)
    for m in range(4):
        yy = iy0 + (m - 1)
        vy = (yy >= 0) & (yy < h)
        yyc = jnp.clip(yy, 0, h - 1)
        for n in range(4):
            xx = ix0 + (n - 1)
            valid = vy & (xx >= 0) & (xx < w)
            xxc = jnp.clip(xx, 0, w - 1)
            idx = (yyc * w + xxc).reshape(bg, hg * wg, 1)
            v = jnp.take_along_axis(flat, idx, axis=1).reshape(bg, hg, wg, c)
            wgt = jnp.where(valid, wy[m] * wx[n], 0.0).astype(interp_dtype)
            out = out + v * wgt[..., None]
    return out.astype(x.dtype)


def identity_like_coordinates(b: int, h: int, w: int) -> jax.Array:
    """The reference's coordinate grid (custom_layers.py:127-134).

    NOTE the preserved quirk: normalization uses (size-1) — an
    align_corners=True-style grid — but sampling uses align_corners=False,
    so "identity" flow is a slight rescale, exactly as in the reference.
    Returns (B, H, W, 2) with channel order (x, y).
    """
    ys = (2.0 * jnp.arange(h, dtype=jnp.float32) / (h - 1)) - 1.0
    xs = (2.0 * jnp.arange(w, dtype=jnp.float32) / (w - 1)) - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    coords = jnp.stack([gx, gy], axis=-1)  # (H, W, 2), x first
    return jnp.broadcast_to(coords[None], (b, h, w, 2))
