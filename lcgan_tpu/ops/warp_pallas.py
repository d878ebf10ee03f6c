"""Fused Pallas TPU kernel for the banded bicubic warp.

Semantics: identical to :func:`lcgan_tpu.ops.grid_sample.grid_sample_bicubic_banded`
— torch ``F.grid_sample(mode='bicubic', padding_mode='zeros',
align_corners=False)`` (custom_layers.py:162-165) for displacement-bounded
grids, evaluated as a dense banded linear operator on the MXU.

Why a kernel at all: the XLA scan formulation re-reads the feature map from
HBM once per band step — 2M+1 = 33/59/109 times at 256/512/1024² — so it
runs ~10-15× off MXU peak, HBM-bound. This kernel DMAs each input slab into
VMEM ONCE per output tile and sweeps the whole band locally:

    out[r, l, c] = Σ_j K(fy[r,l] − row_j) · Σ_s K(fx[r,l] − col_s) · X[r+j, c, s]

Layout: arrays are transposed to (B, H, C, W) and padded by M so the inner
contraction is a (C, S) @ (S, TL) matmul with output columns on lanes —
full lane utilization for ANY channel count (C is the streamed MXU row
dim), which matters because the flagship blocks run C = 128/64/32 at
256/512/1024². Accumulation is fp32 on the MXU regardless of input dtype.

DMA alignment: HBM slices along the minor (lane) dim must be 128-aligned,
so the slab window is DMA'd at ``s_dma = round_up(TL + 2M, 128)`` and the
source arrays are right-padded to match. The extra columns hold zeros (for
features) or ±1e9 (for coordinates) — either way the cubic kernel's compact
support (K(t) = 0 for |t| ≥ 2) makes their contribution exactly zero, so no
masking code exists anywhere.

The backward is two more kernels under ``jax.custom_vjp``:
  * d/dx — the transposed band operator, gridded over INPUT tiles, reading
    a halo'd cotangent slab. The per-band y-weight enters as
    ``(g ∘ ay_row) @ AXB`` — multiplying the contracted dim of the cotangent
    instead of building diag(ay), which keeps everything row-oriented (no
    in-kernel transposes in the hot loop).
  * d/dgrid — forward-style band sweep with the analytic cubic derivative
    K′ (matching torch's grid_sampler backward), reduced against the
    cotangent over channels.
No scatter appears anywhere; every pass is band matmuls from VMEM.

Compile time is flat in resolution (one kernel, no per-tile Python
unrolling). Use ``interpret=True`` to run/test on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_A = -0.75  # torch's cubic convolution constant (UpSample.h)
_FAR = 1e9  # fx/fy pad value; |t| ≥ 2 ⇒ K(t) = 0, so padded positions vanish
_NWAY = 4  # interleaved band accumulators (MXU pipeline overlap)


def _overshoot(m: int) -> int:
    """Rows the NWAY-padded band loop reads past 2m+1 (zero-weight rows)."""
    band = 2 * m + 1
    return (band + _NWAY - 1) // _NWAY * _NWAY - band


def _k(t: jax.Array) -> jax.Array:
    """Cubic convolution kernel K(t), A=-0.75, zero outside |t| < 2. fp32."""
    a = jnp.abs(t)
    near = ((_A + 2.0) * a - (_A + 3.0)) * a * a + 1.0
    far = ((_A * a - 5.0 * _A) * a + 8.0 * _A) * a - 4.0 * _A
    return jnp.where(a <= 1.0, near, jnp.where(a < 2.0, far, 0.0))


def _dk(t: jax.Array) -> jax.Array:
    """Analytic dK/dt (the derivative torch's grid_sampler backward uses)."""
    a = jnp.abs(t)
    s = jnp.sign(t)
    near = (3.0 * (_A + 2.0) * a - 2.0 * (_A + 3.0)) * a
    far = (3.0 * _A * a - 10.0 * _A) * a + 8.0 * _A
    return s * jnp.where(a <= 1.0, near, jnp.where(a < 2.0, far, 0.0))


def _round_up(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


def _pick_rows(h: int, m: int, bytes_per_slab_row: int) -> int:
    """Largest power-of-two row block whose slabs fit a ~5MB VMEM budget."""
    budget = 5 * 1024 * 1024
    r = h
    while r > 8 and (r + 2 * m) * bytes_per_slab_row > budget:
        r //= 2
    return max(r, 1)


def _tiles(h: int, w: int, c: int, m: int, itemsize: int, extra_row_bytes: int = 0):
    """Tile geometry: (rows, tl, s_dma, wpad).

    ``tl`` divides w; multi-tile windows are DMA'd 128-aligned (``s_dma``);
    ``wpad`` is the padded source width every kernel input must carry.
    """
    tl = min(w, 128)
    s_win = tl + 2 * m
    nxt = w // tl
    # Mosaic requires every manual-DMA slice of the HBM lane dim to be a
    # multiple of the 128-lane tile — even full-width slices of small maps.
    s_dma = _round_up(s_win, 128)
    wpad = (nxt - 1) * tl + s_dma
    rows = _pick_rows(h, m, max(c, 8) * s_dma * itemsize + extra_row_bytes)
    return rows, tl, s_dma, wpad


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(fx_ref, fy_ref, xp_ref, out_ref, slab, sem, *, rows, tl, s_dma, m, c):
    band = 2 * m + 1
    b = pl.program_id(0)
    rb = pl.program_id(1)
    xt = pl.program_id(2)

    x_off = pl.multiple_of(xt * tl, 128)  # single tile ⇒ 0; else tl == 128
    src = xp_ref.at[
        b, pl.ds(rb * rows, rows + 2 * m + _overshoot(m)), :, pl.ds(x_off, s_dma)
    ]
    pltpu.make_async_copy(src, slab, sem).start()
    pltpu.make_async_copy(src, slab, sem).wait()

    y0 = (rb * rows - m).astype(jnp.float32)  # abs row of slab row 0
    x0 = (xt * tl - m).astype(jnp.float32)  # abs col of slab col 0
    scol = jax.lax.broadcasted_iota(jnp.int32, (s_dma, tl), 0).astype(jnp.float32) + x0
    cdt = slab.dtype

    def row_body(r, _):
        fxr = fx_ref[0, pl.ds(r, 1), :]  # (1, TL)
        fyr = fy_ref[0, pl.ds(r, 1), :]
        ax_t = _k(fxr - scol).astype(cdt)  # (S, TL)
        rowf = y0 + r.astype(jnp.float32)

        def band_body(i, carry):
            # NWAY interleaved accumulators break the serial dependency chain
            # between consecutive band matmuls so they overlap in the MXU
            # pipeline. The band is padded up to a multiple of NWAY: the
            # extra rows read padded zeros AND get K=0 y-weights, so no
            # peeling logic is needed. ax_t is shared across the band, so
            # each matmul is pure (no VPU-built weight on its input path);
            # the per-j y-weight is a column scale of the OUTPUT, which the
            # VPU applies while the next matmul streams.
            accs = []
            for q in range(_NWAY):
                j = i * _NWAY + q
                p = jax.lax.dot(slab[r + j], ax_t, preferred_element_type=jnp.float32)
                ayj = _k(fyr - (rowf + j.astype(jnp.float32)))  # (1, TL) fp32
                accs.append(carry[q] + ayj * p)
            return tuple(accs)

        zero = jnp.zeros((c, tl), jnp.float32)
        accs = jax.lax.fori_loop(
            0, (band + _NWAY - 1) // _NWAY, band_body, (zero,) * _NWAY
        )
        acc = accs[0]
        for q in range(1, _NWAY):
            acc = acc + accs[q]
        out_ref[0, r] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------


def _dgrid_kernel(
    fx_ref, fy_ref, g_ref, xp_ref, dfx_ref, dfy_ref, slab, sem, *, rows, tl, s_dma, m, c
):
    """Forward-style band sweep with K′; reduce against cotangent over C."""
    band = 2 * m + 1
    b = pl.program_id(0)
    rb = pl.program_id(1)
    xt = pl.program_id(2)

    x_off = pl.multiple_of(xt * tl, 128)  # single tile ⇒ 0; else tl == 128
    src = xp_ref.at[b, pl.ds(rb * rows, rows + 2 * m + _overshoot(m)), :, pl.ds(x_off, s_dma)]
    pltpu.make_async_copy(src, slab, sem).start()
    pltpu.make_async_copy(src, slab, sem).wait()

    y0 = (rb * rows - m).astype(jnp.float32)
    x0 = (xt * tl - m).astype(jnp.float32)
    scol = jax.lax.broadcasted_iota(jnp.int32, (s_dma, tl), 0).astype(jnp.float32) + x0
    cdt = slab.dtype

    def row_body(r, _):
        fxr = fx_ref[0, pl.ds(r, 1), :]
        fyr = fy_ref[0, pl.ds(r, 1), :]
        tx = fxr - scol  # (S, TL)
        ax_t = _k(tx).astype(cdt)
        dax_t = _dk(tx).astype(cdt)
        rowf = y0 + r.astype(jnp.float32)

        def band_body(i, carry):
            # 2-way j interleave x {x, y} targets = 4 concurrent MXU chains.
            # Both weight products factor as (shared rhs matmul) x (per-j
            # output column scale), keeping the MXU input path VPU-free.
            accs = list(carry)
            for q in range(2):
                j = i * 2 + q
                xs = slab[r + j]  # (C, S)
                ty = fyr - (rowf + j.astype(jnp.float32))  # (1, TL)
                px = jax.lax.dot(xs, dax_t, preferred_element_type=jnp.float32)
                py = jax.lax.dot(xs, ax_t, preferred_element_type=jnp.float32)
                accs[2 * q] = accs[2 * q] + _k(ty) * px  # ∂/∂fx
                accs[2 * q + 1] = accs[2 * q + 1] + _dk(ty) * py  # ∂/∂fy
            return tuple(accs)

        zero = jnp.zeros((c, tl), jnp.float32)
        accs = jax.lax.fori_loop(0, (band + 1) // 2, band_body, (zero,) * 4)
        gr = g_ref[0, r].astype(jnp.float32)  # (C, TL)
        dfx_ref[0, r] = jnp.sum(gr * (accs[0] + accs[2]), axis=0)
        dfy_ref[0, r] = jnp.sum(gr * (accs[1] + accs[3]), axis=0)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


def _dx_kernel(
    fxp_ref, fyp_ref, gp_ref, dx_ref, gslab, fxs, fys, axb, sem, *, rows, tl, s_dma, m, c
):
    """Transposed band: each INPUT row gathers from the 2M+1 output rows
    that can sample it. Gridded over input tiles; cotangent read with an
    M-halo. Padded fx/fy positions carry ±1e9 ⇒ K gives exact zero weights.

    AXB[i][s, v] = K(fx[i, s] − v_abs) depends only on the output slab row
    i, so it is built once per tile; the per-(input-row, band) y-weight is
    applied to the contracted dim of the cotangent — (g ∘ ay_row) @ AXB —
    which keeps the hot loop free of transposes.
    """
    band = 2 * m + 1
    srows = rows + 2 * m + _overshoot(m)
    b = pl.program_id(0)
    rb = pl.program_id(1)
    xt = pl.program_id(2)

    x_off = pl.multiple_of(xt * tl, 128)  # single tile ⇒ 0; else tl == 128
    gsrc = gp_ref.at[b, pl.ds(rb * rows, srows), :, pl.ds(x_off, s_dma)]
    fxsrc = fxp_ref.at[b, pl.ds(rb * rows, srows), :, pl.ds(x_off, s_dma)]
    fysrc = fyp_ref.at[b, pl.ds(rb * rows, srows), :, pl.ds(x_off, s_dma)]
    pltpu.make_async_copy(gsrc, gslab, sem.at[0]).start()
    pltpu.make_async_copy(fxsrc, fxs, sem.at[1]).start()
    pltpu.make_async_copy(fysrc, fys, sem.at[2]).start()
    pltpu.make_async_copy(gsrc, gslab, sem.at[0]).wait()
    pltpu.make_async_copy(fxsrc, fxs, sem.at[1]).wait()
    pltpu.make_async_copy(fysrc, fys, sem.at[2]).wait()

    cdt = gslab.dtype
    vcol = jax.lax.broadcasted_iota(jnp.int32, (s_dma, tl), 1).astype(jnp.float32) + (
        xt * tl
    ).astype(jnp.float32)

    def axb_body(i, _):
        fxi = fxs[i]  # (1, S)
        axb[i] = _k(fxi.transpose() - vcol).astype(cdt)  # (S, TL)
        return 0

    jax.lax.fori_loop(0, srows, axb_body, 0)

    def row_body(u, _):
        u_abs = (rb * rows + u).astype(jnp.float32)

        def band_body(iq, carry):
            accs = []
            for q in range(_NWAY):
                i = u + iq * _NWAY + q  # output slab row
                ay_row = _k(fys[i] - u_abs).astype(cdt)  # (1, S)
                gw = gslab[i] * ay_row  # (C, S)
                accs.append(
                    carry[q]
                    + jax.lax.dot(gw, axb[i], preferred_element_type=jnp.float32)
                )
            return tuple(accs)

        zero = jnp.zeros((c, tl), jnp.float32)
        accs = jax.lax.fori_loop(
            0, (band + _NWAY - 1) // _NWAY, band_body, (zero,) * _NWAY
        )
        acc = accs[0]
        for q in range(1, _NWAY):
            acc = acc + accs[q]
        dx_ref[0, u] = acc.astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------


def _coords(grid: jax.Array, h: int, w: int):
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    fx = ((gx + 1.0) * w - 1.0) * 0.5  # align_corners=False unnormalization
    fy = ((gy + 1.0) * h - 1.0) * 0.5
    return fx, fy


def _fwd_call(x: jax.Array, grid: jax.Array, m: int, interpret: bool):
    b, h, w, c = x.shape
    fx, fy = _coords(grid, h, w)
    rows, tl, s_dma, wpad = _tiles(h, w, c, m, x.dtype.itemsize)
    xp = jnp.pad(
        jnp.transpose(x, (0, 1, 3, 2)),
        ((0, 0), (m, m + _overshoot(m)), (0, 0), (m, wpad - w - m)),
    )

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rows=rows, tl=tl, s_dma=s_dma, m=m, c=c),
        grid=(b, h // rows, w // tl),
        in_specs=[
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, c, tl), lambda i, j, k: (i, j, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * m + _overshoot(m), c, s_dma), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fx, fy, xp)
    return jnp.transpose(out, (0, 1, 3, 2)), (xp, fx, fy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grid_sample_bicubic_pallas(
    x: jax.Array, grid: jax.Array, max_disp: int, interpret: bool = False
) -> jax.Array:
    """Fused-kernel bicubic warp; same contract as the banded XLA form.

    ``max_disp`` must bound |sample − output| in pixels plus cubic support
    (use :func:`lcgan_tpu.ops.grid_sample.max_warp_displacement`). H and W
    must be divisible by the row/col tiles (powers of two always are).
    """
    out, _ = _fwd_call(x, grid, int(max_disp), interpret)
    return out


def _vjp_fwd(x, grid, max_disp, interpret):
    out, (xp, fx, fy) = _fwd_call(x, grid, int(max_disp), interpret)
    return out, (xp, fx, fy, jnp.zeros((0,), grid.dtype))


def _vjp_bwd(max_disp, interpret, res, g):
    m = int(max_disp)
    xp, fx, fy, grid_tok = res
    x_dtype, grid_dtype = xp.dtype, grid_tok.dtype
    b, h, w = fx.shape
    c = xp.shape[2]
    itemsize = jnp.dtype(x_dtype).itemsize
    g_t = jnp.transpose(g, (0, 1, 3, 2)).astype(x_dtype)  # (B, H, C, W)
    rows, tl, s_dma, wpad = _tiles(h, w, c, m, itemsize)

    # ---- d/dgrid: forward-style sweep with K' ----
    dfx, dfy = pl.pallas_call(
        functools.partial(_dgrid_kernel, rows=rows, tl=tl, s_dma=s_dma, m=m, c=c),
        grid=(b, h // rows, w // tl),
        in_specs=[
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, rows, c, tl), lambda i, j, k: (i, j, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + 2 * m + _overshoot(m), c, s_dma), x_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fx, fy, g_t, xp)

    # ---- d/dx: transposed band over input tiles ----
    # AXB scratch costs s_dma·tl per slab row on top of the cotangent slab;
    # fold it into the row-block budget.
    rows_dx, _, _, _ = _tiles(
        h, w, c, m, itemsize, extra_row_bytes=s_dma * tl * itemsize + 2 * s_dma * 4
    )
    srows = rows_dx + 2 * m + _overshoot(m)
    gp = jnp.pad(g_t, ((0, 0), (m, m + _overshoot(m)), (0, 0), (m, wpad - w - m)))
    # 4D with a singleton sublane dim so the row dim stays a freely-sliceable
    # major axis; pad coords with ±1e9 (exact zero weight via compact support)
    pad_b = m + _overshoot(m)
    fxp = jnp.pad(
        fx[:, :, None, :], ((0, 0), (m, pad_b), (0, 0), (m, wpad - w - m)), constant_values=_FAR
    )
    fyp = jnp.pad(
        fy[:, :, None, :], ((0, 0), (m, pad_b), (0, 0), (m, wpad - w - m)), constant_values=_FAR
    )
    dx_t = pl.pallas_call(
        functools.partial(_dx_kernel, rows=rows_dx, tl=tl, s_dma=s_dma, m=m, c=c),
        grid=(b, h // rows_dx, w // tl),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, rows_dx, c, tl), lambda i, j, k: (i, j, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), x_dtype),
        scratch_shapes=[
            pltpu.VMEM((srows, c, s_dma), x_dtype),
            pltpu.VMEM((srows, 1, s_dma), jnp.float32),
            pltpu.VMEM((srows, 1, s_dma), jnp.float32),
            pltpu.VMEM((srows, s_dma, tl), x_dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(fxp, fyp, gp)
    dx = jnp.transpose(dx_t, (0, 1, 3, 2))

    # chain through the align_corners=False unnormalization
    dgrid = jnp.stack([dfx * (w * 0.5), dfy * (h * 0.5)], axis=-1).astype(grid_dtype)
    return dx, dgrid


grid_sample_bicubic_pallas.defvjp(_vjp_fwd, _vjp_bwd)
