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

The key throughput lever is m-packing: the rhs weight matrix is shared
across the whole band, so npack = 256/C consecutive band rows go through
ONE (npack·C, S) @ (S, TL) matmul — full MXU row utilization even at
C = 32. The source is reshaped in HBM to (B, Hp/npack, npack·C, W) so
slabs arrive pre-packed (Mosaic cannot reshape sliced values in-kernel),
and band windows are walked pack-aligned: out-of-band rows get K = 0
weights from the cubic kernel's compact support, so the slack is free.

The second lever is the flow-adaptive band (``dyn=True``, the default):
every band sweep derives its window from the coords it already holds
(:func:`_dyn_window` — per-output-row tap extents in fwd/dgrid/scatter,
a per-tile displacement bound in gather-dx), so the ``fori_loop`` trip
count is data-dependent while every shape stays static. Work scales with
the ACTUAL tap spread — typically 4-8 band rows — instead of the
worst-case 2M+1 = 33/59/109 the tanh bound prices at the flagships, with
no ``lax.cond`` (whose scheduling barriers cost more than a halved band
saved at 512², measured round 3) and no fallback cliff.

The backward is more kernels under ``jax.custom_vjp``:
  * d/dgrid — forward-style packed band sweep with [K′ | K]
    column-stacked in one rhs (both coordinate gradients per matmul),
    reduced against the cotangent over channels.
  * d/dx at C ≥ 128 — the transposed band gridded over INPUT tiles
    reading a halo'd cotangent slab; per-band y-weights multiply the
    contracted dim of the cotangent ((g ∘ ay_row) @ AXB).
  * d/dx at C < 128 — scatter-style over OUTPUT tiles, where the per-row
    x-weight rhs IS shared, so packed contributions from one matmul
    accumulate into a fp32 VMEM slab that is DMA'd out whole; a small
    static overlap-add in XLA composes the halo'd slabs.
No data-dependent scatter appears anywhere; every pass is band matmuls
from VMEM.

Compile time is flat in resolution (one kernel, no per-tile Python
unrolling). Use ``interpret=True`` to run/test on CPU.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---- trace-time kernel FLOP meter ------------------------------------------
# XLA's cost_analysis() counts a Pallas kernel as a zero-FLOP custom call, so
# MFU accounting (bench.py) needs the kernels to self-report. Each call-site
# notes its exact matmul FLOPs while TRACING (remat re-traces count too, so
# recompute is included — matching how cost_analysis counts rematerialized
# convs). `useful` is the 16-tap gather-equivalent work (2 FLOPs/tap/channel),
# the denominator-free measure of algorithmic overhead of the banded form.
# Under the dynamic band (dyn=True) the executed matmul count is
# data-dependent and BELOW the noted static full-band figure, which is then
# an upper bound on work — `mfu` overstates utilization while `mfu_useful`
# stays exact; read the pair as a bracket.
_flop_accum = None


def _note_flops(actual: int, useful: int):
    if _flop_accum is not None:
        _flop_accum[0] += actual
        _flop_accum[1] += useful


@contextlib.contextmanager
def flop_meter():
    """Collects [actual_kernel_flops, useful_gather_flops] noted while tracing."""
    global _flop_accum
    prev = _flop_accum
    _flop_accum = acc = [0, 0]
    try:
        yield acc
    finally:
        _flop_accum = prev


# ---- executed-work meter (dynamic band) -------------------------------------
# The static _note_flops figure prices the FULL band (pb packs/row); under
# dyn=True the kernels execute a data-dependent subset. The executed pack
# count is computable with the same integer math as _dyn_window from the
# GRID alone, so the meter estimates it in the OUTER trace scope — in the
# public wrapper, BEFORE the custom_vjp boundary (traced scalars cannot
# escape the custom_vjp fwd/bwd traces, and the axon PJRT backend has no
# host callbacks at all, so both in-scope designs are ruled out; measured
# r4). `with_executed_flops` wraps a step so it additionally returns
# (executed, static) sums over every warp call, each call priced as
# fwd + backward kernels; bench.py divides them into an executed/static
# RATIO and scales the flop_meter total. The ratio is insensitive to the
# one approximation made — calls whose backward is DCE'd (e.g. G fakes in
# the D step) are still priced with a backward, but their window fraction
# matches everyone else's, so the weighted mean barely moves (the gate on
# claiming ±10%).
_exec_collect = None


def _call_flops_estimate(x_shape, itemsize: int, grid, m: int, dyn) -> None:
    """Append (executed, static) matmul-FLOP scalars for ONE warp call
    (forward + backward kernels) to the active meter, from outer scope."""
    b, h, w, c = x_shape
    fx, fy = _coords(grid, h, w)
    del fx
    ex, st = [], 0.0

    if _use_small(h, w, c, m, itemsize):
        groups = _small_groups(h, w, c, m)
        cg = c // groups
        bb = groups * b
        npack, unroll = _npack(cg), _unroll(cg)
        nr, lanes, t_tiles, s_dma, pb, hp = _small_geom(h, w, cg, m)
        fyr = jnp.broadcast_to(fy[None], (groups,) + fy.shape).reshape(bb, t_tiles, lanes)
        frac = (
            _band_fraction(fyr, -float(m), npack, unroll, hp // npack, pb)
            if dyn is True
            else 1.0
        )
        # fwd (1·lanes) + dgrid (2·lanes) + dx (1·lanes) per pack — all
        # three kernels share the per-tile window
        static = bb * t_tiles * pb * 2 * npack * cg * s_dma * 4 * lanes
        st += static
        ex.append(float(static) * frac)
    else:
        npack, unroll = _npack(c), _unroll(c)
        rows, tl, s_dma, wpad = _tiles(h, w, c, m, itemsize)
        pb, p_slab, _ = _pack_geom(h, rows, m, npack, unroll)
        frac = (
            _big_dyn_fraction(fy, rows, tl, m, npack, unroll, p_slab, pb)
            if dyn is True
            else 1.0
        )
        # fwd (1·tl) + dgrid (2·tl) share geometry and window
        static = b * h * (w // tl) * pb * 2 * npack * c * s_dma * 3 * tl
        st += static
        ex.append(float(static) * frac)
        if c >= 128:
            # gather-dx: the kernel bounds each tile's band by the measured
            # per-tile displacement (see _dx_gather_kernel) — price the
            # executed trips with the same dmax math instead of the former
            # full-static face value
            band_r = 2 * m + 1 + _overshoot(m)
            static = b * h * (w // tl) * band_r * 2 * c * s_dma * tl
            st += static
            if dyn is True:
                rows_g = _tiles(
                    h, w, c, m, itemsize,
                    extra_row_bytes=s_dma * tl * itemsize + 2 * s_dma * 4,
                )[0]
                frac_g = _gather_dx_fraction(fy, rows_g, tl, s_dma, m)
            else:
                frac_g = 1.0
            ex.append(float(static) * frac_g)
        else:
            rows_dx = _pick_rows_dx(h, w, c, m, itemsize)
            pb_dx, p_dx, _ = _pack_geom(h, rows_dx, m, npack, unroll)
            frac_dx = (
                _big_dyn_fraction(fy, rows_dx, tl, m, npack, unroll, p_dx, pb_dx)
                if dyn is True
                else 1.0
            )
            static = b * h * (w // tl) * pb_dx * 2 * npack * c * tl * s_dma
            st += static
            ex.append(float(static) * frac_dx)

    _exec_collect[0].append(sum(ex[1:], ex[0]))
    _exec_collect[1].append(st)


def _gather_dx_fraction(fy, rows: int, tl: int, s_dma: int, m: int) -> float:
    """Executed fraction of the gather-dx kernel's NWAY-padded band.

    The kernel bounds each (row-block, column-tile) tile's band by the max
    |fy − output_row| over its fys slab (core rows + m-halo + overshoot,
    column halo included; padded coords masked — see _dx_gather_kernel's
    ``axb_body``/``d2``), then runs ``ceil((2·(⌊dmax⌋+3)+1)/NWAY)`` trips
    per input row. Reproduced here in jnp (trace-safe: also runs inside the
    ``with_executed_flops`` wrapper's trace) from the same coords.
    """
    b, h, w = fy.shape
    dv = jnp.abs(fy - jnp.arange(h, dtype=jnp.float32)[None, :, None])
    over = _overshoot(m)
    trips_full = (2 * m + 1 + over) // _NWAY
    nrb, nxt = h // rows, w // tl
    total = jnp.float32(0.0)
    for rb in range(nrb):
        r_lo, r_hi = max(rb * rows - m, 0), min(rb * rows + rows + m + over, h)
        for xt in range(nxt):
            c_lo, c_hi = max(xt * tl - m, 0), min(xt * tl - m + s_dma, w)
            d2 = jnp.floor(jnp.max(dv[:, r_lo:r_hi, c_lo:c_hi], axis=(1, 2))).astype(jnp.int32) + 3
            total = total + jnp.sum(
                jnp.minimum((2 * d2 + 1 + _NWAY - 1) // _NWAY, trips_full).astype(jnp.float32)
            )
    return total / (b * nrb * nxt * trips_full)


def _big_dyn_fraction(fy, rows: int, tl: int, m: int, npack: int, unroll: int, p_slab: int, pb: int):
    """Executed fraction for the general (big-map) kernels: per-output-row
    windows over (rows-block, column-tile) blocks, slab row 0 at rb·rows−m."""
    b, h, w = fy.shape
    nrb = h // rows
    fy_g = fy.reshape(b, nrb, rows, w // tl, tl)
    fy_g = jnp.moveaxis(fy_g, 2, 3)  # (..., nxt, rows, tl): reduce tl last
    y0 = (jnp.arange(nrb, dtype=jnp.float32) * rows - m)[None, :, None, None]
    return _band_fraction(fy_g, y0, npack, unroll, p_slab, pb)


def _band_fraction(fy_rows, y0, npack: int, unroll: int, p_slab: int, pb: int):
    """Mean executed-band fraction over rows: _dyn_window's trip math,
    vectorized. ``fy_rows``: sample y-coords with the kernel's per-window
    lane group LAST; ``y0``: slab-row-0 offset, broadcastable against the
    reduced shape."""
    lo = jnp.floor(jnp.min(fy_rows, axis=-1)) - 1.0 - y0
    hi = jnp.floor(jnp.max(fy_rows, axis=-1)) + 2.0 - y0
    last = p_slab * npack - 1
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, last)
    hi_i = jnp.clip(hi.astype(jnp.int32), lo_i, last)
    trips = (hi_i // npack - lo_i // npack + unroll) // unroll
    trips = jnp.minimum(trips, pb // unroll)
    return jnp.mean(trips.astype(jnp.float32)) * (unroll / pb)


def with_executed_flops(fn):
    """Wrap ``fn`` so it ALSO returns (executed, static) warp matmul FLOPs.

    ``wrapped(*a, **kw) -> (fn(*a, **kw), executed)`` plus
    ``wrapped.static_flops`` (host float, set at trace time), each summed
    over every warp call in the trace, with each
    call priced as forward + backward kernels with the dynamic band's
    tap-exact window fraction evaluated on the same flow coords the kernels
    derive their fori_loop trips from (static-band gather-dx at face
    value). bench.py runs one fresh jit of the wrapped step and scales the
    flop_meter total by executed/static. Keep it out of timed loops: the
    window math is negligible, the extra compile is not.

    SINGLE-TRACE CONTRACT: ``wrapped.static_flops`` is set at TRACE time
    only. If the jitted ``wrapped`` is called again without retracing (jit
    cache hit), the traced ``executed`` output is recomputed but the
    attribute keeps the prior trace's value — pair each reading of
    ``static_flops`` with a fresh jit (or a first call), never a cached
    replay.
    """

    def wrapped(*args, **kwargs):
        global _exec_collect
        prev = _exec_collect
        _exec_collect = (ex, st) = ([], [])
        try:
            out = fn(*args, **kwargs)
        finally:
            _exec_collect = prev
        executed = sum(ex[1:], ex[0]) if ex else jnp.float32(0.0)
        # the static total is pure host arithmetic — expose it as an
        # attribute (set at trace time) instead of a jit output, which
        # would round it through fp32
        wrapped.static_flops = float(sum(st))
        return out, executed

    wrapped.static_flops = 0.0
    return wrapped

_A = -0.75  # torch's cubic convolution constant (UpSample.h)
_FAR = 1e9  # fx/fy pad value; |t| ≥ 2 ⇒ K(t) = 0, so padded positions vanish
_NWAY = 4  # interleaved band accumulators (gather-dx kernel)

# Probe overrides (tools/warp_dynpack_probe.py): force npack/unroll for ALL
# channel counts, from the environment so a subprocess-per-config sweep keeps
# kernel geometry and host wrappers consistent. Unset in production.
_NPACK_FORCE = int(os.environ.get("LCGAN_WARP_NPACK", "0")) or None
_UNROLL_FORCE = int(os.environ.get("LCGAN_WARP_UNROLL", "0")) or None


def _unroll(c: int) -> int:
    """Packs per band-loop body: 2 everywhere.

    The fori_loop trip granularity is ``unroll · npack`` band rows — any
    slack between a typical 4-8-row dynamic-band tap window and that
    granularity is executed with K = 0 weights. The r3 pick of unroll=4 at
    C < 128 predates the dynamic band (static trips don't care about
    granularity); the r5 re-sweep on trained-magnitude flows
    (tools/warp_dynpack_probe.py, v5e, bf16, ms/application fwd / fwd+bwd)
    measured unroll=2 strictly better at the low-channel flagships —
    512²c64 16.2/49.4 → 13.1/46.4, 1024²c32 28.3/72.7 → 22.7/66.0 — by
    halving that slack (32 → 16 rows/trip at c32), while unroll=1 gives
    the slack back to loop overhead and npack < 256/C starves MXU rows.
    """
    if _UNROLL_FORCE:
        return _UNROLL_FORCE
    return 2


def _npack(c: int) -> int:
    """Band rows packed along the matmul m-dim per MXU op.

    The rhs (cubic x-weights) is shared across the whole band, so npack
    consecutive band rows go through one (npack·C, S) @ (S, TL) matmul.
    The packing happens in HBM: the padded source is reshaped (free,
    row-major compatible) to (B, Hp/npack, npack·C, W) so slabs arrive
    pre-packed — Mosaic cannot reshape a sliced value in-kernel. Band
    windows are walked pack-ALIGNED; rows outside [r, r+band) get K = 0
    y-weights by the displacement bound, so alignment slack is free.
    Target m ≈ 256 (two full MXU row tiles) — unpacked, the flagship
    blocks stream only C = 128/64/32 rows and waste most of the array.

    Always a power of two: the pack count must divide the power-of-two
    row blocks (_pick_rows), or the slab DMA start rb·(rows/npack) would
    misalign the band origin for multi-row-block maps (non-pow2 channel
    counts like c=48 would otherwise yield npack=5).
    """
    if _NPACK_FORCE:
        return _NPACK_FORCE
    raw = max(1, min(8, 256 // max(c, 1)))
    return 1 << (raw.bit_length() - 1)


def _overshoot(m: int, nway: int = _NWAY) -> int:
    """Rows the gather-dx padded band loop reads past 2m+1 (zero-weight)."""
    band = 2 * m + 1
    return _round_up(band, nway) - band


def _pack_geom(h: int, rows: int, m: int, npack: int, unroll: int = 2):
    """(packs_per_band, slab_packs, padded_height) for the packed layout."""
    band = 2 * m + 1
    pb = (band + 2 * npack - 2) // npack  # pack-aligned cover of any band
    pb = _round_up(pb, unroll)  # the band loop unrolls this many packs/body
    p_slab = (rows - 1) // npack + pb
    hp = (h // rows - 1) * rows + p_slab * npack  # ≥ h + 2m, npack-aligned
    return pb, p_slab, hp


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


def _prec(dt):
    """fp32 inputs get true-fp32 matmuls — Mosaic's default lowers fp32 dots
    to bf16-ish fast passes (measured ~3e-3 relative on-device error,
    tools/warp_check.py round 3); bf16 inputs run native MXU."""
    return jax.lax.Precision.HIGHEST if dt == jnp.float32 else None


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


def _dyn_window(fyr, y0, npack, unroll, p_slab, pb):
    """Tap-exact per-row band window: (start pack, fori trips).

    A bicubic sample at f reads taps floor(f)−1 … floor(f)+2 only, so the
    band an output row actually needs is the min/max of its OWN sample
    coords — typically 4-8 slab rows even when the worst-case displacement
    bound M prices 2M+1 (33/59/109 at the flagships). Derived in-kernel
    from ``fyr`` (two lane reductions), so no host scalar, no ``lax.cond``,
    and no fallback cliff: rows that pack-alignment slack drags in get
    exact K = 0 weights, so only the trip count changes — never the values.
    Clamps keep every access inside the static slab for any fy.
    """
    lo = jnp.floor(jnp.min(fyr)) - 1.0 - y0  # slab-row coords
    hi = jnp.floor(jnp.max(fyr)) + 2.0 - y0
    last = p_slab * npack - 1
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, last)
    hi_i = jnp.clip(hi.astype(jnp.int32), lo_i, last)
    p0 = lo_i // npack
    trips = (hi_i // npack - p0 + unroll) // unroll  # ceil((packs)/unroll)
    trips = jnp.minimum(trips, pb // unroll)
    p0 = jnp.clip(p0, 0, p_slab - trips * unroll)
    return p0, trips


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------


def _fwd_kernel(
    fx_ref, fy_ref, xp_ref, out_ref, slab, sem, *, rows, tl, s_dma, m, c, pb, dyn=True
):
    npack = _npack(c)
    unroll = _unroll(c)
    b = pl.program_id(0)
    rb = pl.program_id(1)
    xt = pl.program_id(2)
    p_slab = slab.shape[0]

    x_off = pl.multiple_of(xt * tl, 128)  # single tile ⇒ 0; else tl == 128
    # xp is pre-packed (B, Hp/npack, npack·C, Wp); slab rows are PACKS
    src = xp_ref.at[b, pl.ds(rb * (rows // npack), p_slab), :, pl.ds(x_off, s_dma)]
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
        if dyn == 2:  # overhead probe: window math + traced bound, full work
            _, tr = _dyn_window(fyr, y0, npack, unroll, slab.shape[0], pb)
            p0, trips = r // npack, jnp.maximum(tr, pb // unroll)
        elif dyn:  # tap-exact band from the row's own coords (see _dyn_window)
            p0, trips = _dyn_window(fyr, y0, npack, unroll, slab.shape[0], pb)
        else:
            p0, trips = r // npack, pb // unroll

        def band_body(i, carry):
            # ax_t is shared across the whole band, so each pack of npack
            # band rows is ONE (npack·C, S) @ (S, TL) matmul — full MXU row
            # utilization even at C = 32 — and the matmuls are pure (no
            # accumulator dependency): per-row y-weights scale the output
            # chunks on the VPU while the next matmul streams. Pack-aligned
            # slack rows get K = 0 y-weights via the displacement bound.
            # Two packs per body: loop-body ILP measurably beats one dot
            # per iteration.
            accs = list(carry)
            for u_slot in range(unroll):
                pk = p0 + unroll * i + u_slot
                xs = slab[pk]  # (npack·C, S) — pre-packed, no reshape
                p = jax.lax.dot(xs, ax_t, preferred_element_type=jnp.float32, precision=_prec(cdt))
                uf = pk.astype(jnp.float32) * float(npack)
                for q in range(npack):
                    k = u_slot * npack + q
                    ayj = _k(fyr - (y0 + uf + float(q)))  # (1, TL) fp32
                    accs[k] = accs[k] + ayj * p[q * c : (q + 1) * c]
            return tuple(accs)

        zero = jnp.zeros((c, tl), jnp.float32)
        accs = jax.lax.fori_loop(0, trips, band_body, (zero,) * (unroll * npack))
        acc = accs[0]
        for q in range(1, unroll * npack):
            acc = acc + accs[q]
        out_ref[0, r] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


# --------------------------------------------------------------------------
# small-map kernels (w <= 64): whole map in VMEM, rows packed onto lanes
# --------------------------------------------------------------------------
#
# At map sizes <= 64² the per-row formulation wastes the machine twice: the
# row loop runs H tiny iterations, and each matmul's output has only W <= 64
# of 128 lanes live. Here nr = 128 // w consecutive output ROWS share one
# lane tile: the x-window of every row is the whole (padded-to-128) map
# width, so one (S=128, 128) weight matrix covers all 128 output positions
# — ax[s, i·w+l] = K(fx[r0+i, l] − (s − m)) — and the y-band of the tile
# spans nr + 2M rows, amortizing band sweeps across the packed rows. The
# whole padded map lives in VMEM via BlockSpec (no manual DMA): the largest
# small-map slab (64² × c512) is ~2.6 MB. d/dx needs no overlap-add — the
# single window covers the whole map, so the kernel accumulates straight
# into the (packed) output slab and the host just crops the M-halo.


def _small_geom(h: int, w: int, c: int, m: int):
    """(nr, lanes, t_tiles, s_dma, pb, hp) for the packed small-map layout."""
    nr = min(max(128 // w, 1), h)
    lanes = nr * w
    t_tiles = h // nr
    npack = _npack(c)
    unroll = _unroll(c)
    s_dma = _round_up(w + 2 * m, 128)
    pb = (nr + 2 * m + 2 * npack - 2) // npack  # pack-aligned cover of any tile's band
    pb = _round_up(pb, unroll)
    hp = ((h - nr) // npack + pb) * npack  # >= h + 2m, npack-aligned
    return nr, lanes, t_tiles, s_dma, pb, hp


def _small_groups(h: int, w: int, c: int, m: int):
    """Channel-group split bounding the largest VMEM tenant (the dx kernel's
    fp32 whole-map slab) to ~6MB. The warp is channelwise-independent, so
    groups ride the batch grid dim: (B, H, W, G·c') → (G·B, H, W, c').
    Returns the group count, or None if no divisor fits (→ general kernel).
    """
    groups = 1
    while True:
        cg = c // groups
        _, _, _, s_dma, _, hp = _small_geom(h, w, cg, m)
        if hp * max(cg, 8) * s_dma * 4 <= 6 * 1024 * 1024:
            return groups
        if cg % 2 or groups * 2 > c:
            return None
        groups *= 2


def _use_small(h: int, w: int, c: int, m: int, itemsize: int) -> bool:
    del itemsize
    nr = _small_geom(h, w, c, m)[0]  # the kernels' own row-pack rule
    if w > 64 or 128 % w or h % nr:
        return False
    return _small_groups(h, w, c, m) is not None


def _split_groups(x: jax.Array, groups: int):
    """(B, H, W, G·c') → (G·B, H, W, c'), group-major."""
    b, h, w, c = x.shape
    cg = c // groups
    xg = x.reshape(b, h, w, groups, cg)
    return jnp.transpose(xg, (3, 0, 1, 2, 4)).reshape(groups * b, h, w, cg)


def _merge_groups(out: jax.Array, groups: int):
    gb, h, w, cg = out.shape
    b = gb // groups
    og = out.reshape(groups, b, h, w, cg)
    return jnp.transpose(og, (1, 2, 3, 0, 4)).reshape(b, h, w, groups * cg)


def _small_pack(x_t: jax.Array, h: int, w: int, m: int, s_dma: int, hp: int, npack: int):
    """Pad (B, H, C, W) and pack rows: (B, Hp/npack, npack·C, s_dma)."""
    b, _, c, _ = x_t.shape
    xp = jnp.pad(x_t, ((0, 0), (m, hp - h - m), (0, 0), (m, s_dma - w - m)))
    return xp.reshape(b, hp // npack, npack * c, s_dma)


def _small_tile_coords(fx, fy, b, t_tiles, lanes):
    return fx.reshape(b, t_tiles, lanes), fy.reshape(b, t_tiles, lanes)


def _fwd_small_kernel(fx_ref, fy_ref, xp_ref, out_ref, *, t_tiles, lanes, m, c, pb, nr, dyn=True):
    npack = _npack(c)
    unroll = _unroll(c)
    s_dma = xp_ref.shape[-1]
    scol = jax.lax.broadcasted_iota(jnp.int32, (s_dma, lanes), 0).astype(jnp.float32) - float(m)
    cdt = xp_ref.dtype

    def tile_body(t, _):
        fxr = fx_ref[0, pl.ds(t, 1), :]  # (1, lanes) — lanes = nr rows × w cols
        fyr = fy_ref[0, pl.ds(t, 1), :]
        ax_t = _k(fxr - scol).astype(cdt)  # (S, lanes): whole-width window per position
        if dyn:  # tap-exact band for the tile's nr rows (see _dyn_window)
            p0, trips = _dyn_window(fyr, -float(m), npack, unroll, xp_ref.shape[1], pb)
        else:
            p0, trips = (t * nr) // npack, pb // unroll

        def band_body(i, carry):
            accs = list(carry)
            for u_slot in range(unroll):
                pk = p0 + unroll * i + u_slot
                xs = xp_ref[0, pk]  # (npack·C, S) — whole-map slab, pre-packed
                p = jax.lax.dot(xs, ax_t, preferred_element_type=jnp.float32, precision=_prec(cdt))
                uf = pk.astype(jnp.float32) * float(npack) - float(m)
                for q in range(npack):
                    k = u_slot * npack + q
                    ayj = _k(fyr - (uf + float(q)))  # (1, lanes) fp32
                    accs[k] = accs[k] + ayj * p[q * c : (q + 1) * c]
            return tuple(accs)

        zero = jnp.zeros((c, lanes), jnp.float32)
        accs = jax.lax.fori_loop(0, trips, band_body, (zero,) * (unroll * npack))
        acc = accs[0]
        for q in range(1, unroll * npack):
            acc = acc + accs[q]
        out_ref[0, t] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, t_tiles, tile_body, 0)


def _dgrid_small_kernel(
    fx_ref, fy_ref, g_ref, xp_ref, dfx_ref, dfy_ref, *, t_tiles, lanes, m, c, pb, nr,
    dyn=True,
):
    npack = _npack(c)
    unroll = _unroll(c)
    s_dma = xp_ref.shape[-1]
    scol = jax.lax.broadcasted_iota(jnp.int32, (s_dma, lanes), 0).astype(jnp.float32) - float(m)
    cdt = xp_ref.dtype

    def tile_body(t, _):
        fxr = fx_ref[0, pl.ds(t, 1), :]
        fyr = fy_ref[0, pl.ds(t, 1), :]
        tx = fxr - scol
        ax2 = jnp.concatenate((_dk(tx), _k(tx)), axis=1).astype(cdt)  # (S, 2·lanes)
        if dyn:
            p0, trips = _dyn_window(fyr, -float(m), npack, unroll, xp_ref.shape[1], pb)
        else:
            p0, trips = (t * nr) // npack, pb // unroll

        def band_body(i, carry):
            accs = list(carry)
            for u_slot in range(unroll):
                pk = p0 + unroll * i + u_slot
                xs = xp_ref[0, pk]
                p2 = jax.lax.dot(xs, ax2, preferred_element_type=jnp.float32, precision=_prec(cdt))
                uf = pk.astype(jnp.float32) * float(npack) - float(m)
                for q in range(npack):
                    k = 2 * (u_slot * npack + q)
                    ty = fyr - (uf + float(q))
                    pq = p2[q * c : (q + 1) * c]
                    accs[k] = accs[k] + _k(ty) * pq[:, :lanes]  # ∂/∂fx
                    accs[k + 1] = accs[k + 1] + _dk(ty) * pq[:, lanes:]  # ∂/∂fy
            return tuple(accs)

        zero = jnp.zeros((c, lanes), jnp.float32)
        accs = jax.lax.fori_loop(0, trips, band_body, (zero,) * (2 * unroll * npack))
        gr = g_ref[0, t].astype(jnp.float32)  # (C, lanes)
        acc_x = accs[0]
        acc_y = accs[1]
        for q in range(1, unroll * npack):
            acc_x = acc_x + accs[2 * q]
            acc_y = acc_y + accs[2 * q + 1]
        dfx_ref[0, t] = jnp.sum(gr * acc_x, axis=0)
        dfy_ref[0, t] = jnp.sum(gr * acc_y, axis=0)
        return 0

    jax.lax.fori_loop(0, t_tiles, tile_body, 0)


def _dx_small_kernel(fx_ref, fy_ref, g_ref, out_ref, *, t_tiles, lanes, m, c, pb, nr, dyn=True):
    """Scatter-style d/dx into the whole-map packed slab (fp32, in VMEM).

    Single window ⇒ no inter-tile halos: each output tile's band matmul
    (npack·C, lanes) @ (lanes, S) accumulates directly into the packed
    output rows; the host only crops the M-halo and unpacks.
    """
    npack = _npack(c)
    unroll = _unroll(c)
    s_dma = out_ref.shape[-1]
    scol = jax.lax.broadcasted_iota(jnp.int32, (s_dma, lanes), 0).astype(jnp.float32) - float(m)
    cdt = g_ref.dtype
    out_ref[...] = jnp.zeros_like(out_ref)

    def tile_body(t, _):
        fxr = fx_ref[0, pl.ds(t, 1), :]
        fyr = fy_ref[0, pl.ds(t, 1), :]
        ax_rt = jnp.transpose(_k(fxr - scol).astype(cdt))  # (lanes, S)
        g_t = g_ref[0, t]  # (C, lanes)
        if dyn:
            p0, trips = _dyn_window(fyr, -float(m), npack, unroll, out_ref.shape[1], pb)
        else:
            p0, trips = (t * nr) // npack, pb // unroll

        def band_body(i, _):
            for u_slot in range(unroll):
                pk = p0 + unroll * i + u_slot
                uf = pk.astype(jnp.float32) * float(npack) - float(m)
                chunks = []
                for q in range(npack):
                    ayq = _k(fyr - (uf + float(q))).astype(cdt)  # (1, lanes)
                    chunks.append(g_t * ayq)
                lhs = chunks[0] if npack == 1 else jnp.concatenate(chunks, axis=0)
                p = jax.lax.dot(lhs, ax_rt, preferred_element_type=jnp.float32, precision=_prec(cdt))
                out_ref[0, pk] = out_ref[0, pk] + p  # (npack·C, S)
            return 0

        jax.lax.fori_loop(0, trips, band_body, 0)
        return 0

    jax.lax.fori_loop(0, t_tiles, tile_body, 0)


def _fwd_small_call(x, grid, m: int, interpret: bool, note: bool = True, dyn: bool = True):
    b, h, w, c = x.shape
    groups = _small_groups(h, w, c, m)
    if groups > 1:
        grid_g = jnp.broadcast_to(grid[None], (groups,) + grid.shape).reshape(
            groups * b, h, w, 2
        )
        out = _fwd_small_call(_split_groups(x, groups), grid_g, m, interpret, note, dyn)
        return _merge_groups(out, groups)
    fx, fy = _coords(grid, h, w)
    npack = _npack(c)
    nr, lanes, t_tiles, s_dma, pb, hp = _small_geom(h, w, c, m)
    if note:
        _note_flops(b * t_tiles * pb * 2 * npack * c * s_dma * lanes, 32 * b * h * w * c)
    xp = _small_pack(jnp.transpose(x, (0, 1, 3, 2)), h, w, m, s_dma, hp, npack)
    fxr, fyr = _small_tile_coords(fx, fy, b, t_tiles, lanes)

    out = pl.pallas_call(
        functools.partial(
            _fwd_small_kernel, t_tiles=t_tiles, lanes=lanes, m=m, c=c, pb=pb, nr=nr,
            dyn=dyn,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_tiles, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tiles, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, hp // npack, npack * c, s_dma), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tiles, c, lanes), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_tiles, c, lanes), x.dtype),
        interpret=interpret,
    )(fxr, fyr, xp)
    out = out.reshape(b, t_tiles, c, nr, w)
    return jnp.transpose(out, (0, 1, 3, 4, 2)).reshape(b, h, w, c)


def _bwd_small_call(x, grid, g, m: int, interpret: bool, note: bool = True, dyn: bool = True):
    b, h, w, c = x.shape
    groups = _small_groups(h, w, c, m)
    if groups > 1:
        grid_g = jnp.broadcast_to(grid[None], (groups,) + grid.shape).reshape(
            groups * b, h, w, 2
        )
        dx, dfx, dfy = _bwd_small_call(
            _split_groups(x, groups), grid_g, _split_groups(g, groups), m, interpret, note,
            dyn,
        )
        # the grid is shared across channel groups: its cotangent sums
        return (
            _merge_groups(dx, groups),
            jnp.sum(dfx.reshape(groups, b, h, w), axis=0),
            jnp.sum(dfy.reshape(groups, b, h, w), axis=0),
        )
    x_dtype = x.dtype
    npack = _npack(c)
    nr, lanes, t_tiles, s_dma, pb, hp = _small_geom(h, w, c, m)
    # dgrid: (npack·C, S) @ (S, 2·lanes) per pack; dx: (npack·C, lanes) @ (lanes, S)
    if note:
        _note_flops(
            b * t_tiles * pb * 2 * npack * c * s_dma * 3 * lanes, 96 * b * h * w * c
        )
    fx, fy = _coords(grid, h, w)
    fxr, fyr = _small_tile_coords(fx, fy, b, t_tiles, lanes)
    xp = _small_pack(jnp.transpose(x, (0, 1, 3, 2)), h, w, m, s_dma, hp, npack)
    # cotangent packed like the output layout: (B, T, C, lanes)
    g_p = g.astype(x_dtype).reshape(b, t_tiles, nr, w, c)
    g_p = jnp.transpose(g_p, (0, 1, 4, 2, 3)).reshape(b, t_tiles, c, lanes)

    kw = dict(t_tiles=t_tiles, lanes=lanes, m=m, c=c, pb=pb, nr=nr, dyn=dyn)
    coord_spec = pl.BlockSpec((1, t_tiles, lanes), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, t_tiles, c, lanes), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    slab_spec = pl.BlockSpec(
        (1, hp // npack, npack * c, s_dma), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )

    dfx, dfy = pl.pallas_call(
        functools.partial(_dgrid_small_kernel, **kw),
        grid=(b,),
        in_specs=[coord_spec, coord_spec, g_spec, slab_spec],
        out_specs=(coord_spec, coord_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_tiles, lanes), jnp.float32),
            jax.ShapeDtypeStruct((b, t_tiles, lanes), jnp.float32),
        ),
        interpret=interpret,
    )(fxr, fyr, g_p, xp)
    dfx = dfx.reshape(b, h, w)
    dfy = dfy.reshape(b, h, w)

    dslab = pl.pallas_call(
        functools.partial(_dx_small_kernel, **kw),
        grid=(b,),
        in_specs=[coord_spec, coord_spec, g_spec],
        out_specs=pl.BlockSpec(
            (1, hp // npack, npack * c, s_dma), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp // npack, npack * c, s_dma), jnp.float32),
        interpret=interpret,
    )(fxr, fyr, g_p)
    dx_t = dslab.reshape(b, hp, c, s_dma)[:, m : m + h]  # crop row halo
    dx = jnp.transpose(dx_t, (0, 1, 3, 2))[:, :, m : m + w]  # crop col halo
    return dx.astype(x_dtype), dfx, dfy


# --------------------------------------------------------------------------
# backward kernels
# --------------------------------------------------------------------------


def _dgrid_kernel(
    fx_ref, fy_ref, g_ref, xp_ref, dfx_ref, dfy_ref, slab, sem, *, rows, tl, s_dma, m, c, pb,
    dyn=True,
):
    """Forward-style band sweep with K′; reduce against cotangent over C."""
    unroll = _unroll(c)
    b = pl.program_id(0)
    rb = pl.program_id(1)
    xt = pl.program_id(2)

    npack = _npack(c)
    p_slab = slab.shape[0]
    x_off = pl.multiple_of(xt * tl, 128)  # single tile ⇒ 0; else tl == 128
    src = xp_ref.at[b, pl.ds(rb * (rows // npack), p_slab), :, pl.ds(x_off, s_dma)]
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
        # ONE matmul per npack band rows with [K' | K] column-stacked rhs:
        # (npack·C, S) @ (S, 2TL) — both the dfx and dfy contractions for
        # npack pre-packed rows in a single full-m MXU op; y-weights
        # split/scale the output chunks on the VPU.
        ax2 = jnp.concatenate((_dk(tx), _k(tx)), axis=1).astype(cdt)  # (S, 2TL)
        if dyn:  # K and K' share the |t| < 2 support, so the same window is exact
            p0, trips = _dyn_window(fyr, y0, npack, unroll, p_slab, pb)
        else:
            p0, trips = r // npack, pb // unroll

        def band_body(i, carry):
            accs = list(carry)
            for u_slot in range(unroll):
                pk = p0 + unroll * i + u_slot
                xs = slab[pk]  # (npack·C, S)
                p2 = jax.lax.dot(xs, ax2, preferred_element_type=jnp.float32, precision=_prec(cdt))
                uf = pk.astype(jnp.float32) * float(npack)
                for q in range(npack):
                    k = 2 * (u_slot * npack + q)
                    ty = fyr - (y0 + uf + float(q))  # (1, TL)
                    pq = p2[q * c : (q + 1) * c]
                    accs[k] = accs[k] + _k(ty) * pq[:, :tl]  # ∂/∂fx
                    accs[k + 1] = accs[k + 1] + _dk(ty) * pq[:, tl:]  # ∂/∂fy
            return tuple(accs)

        zero = jnp.zeros((c, tl), jnp.float32)
        accs = jax.lax.fori_loop(0, trips, band_body, (zero,) * (2 * unroll * npack))
        gr = g_ref[0, r].astype(jnp.float32)  # (C, TL)
        acc_x = accs[0]
        acc_y = accs[1]
        for q in range(1, unroll * npack):
            acc_x = acc_x + accs[2 * q]
            acc_y = acc_y + accs[2 * q + 1]
        dfx_ref[0, r] = jnp.sum(gr * acc_x, axis=0)
        dfy_ref[0, r] = jnp.sum(gr * acc_y, axis=0)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


def _dx_gather_kernel(
    fxp_ref, fyp_ref, gp_ref, dx_ref, gslab, fxs, fys, axb, sem, *, rows, tl, s_dma, m, c,
    dyn=True,
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

    # Per-tile displacement bound measured from the fys slab already in
    # VMEM (folded into the AXB build loop — Mosaic has no 3-D iota):
    # output row i can touch input row u only if |fy_i − u| < 2, and
    # |fy_i − i| ≤ d_max over the tile, so the band per input row is
    # 2(d_max+2)+1 rows — priced by the ACTUAL flow, not the tanh bound.
    # Padded coords (±_FAR) are masked out of the max and still carry
    # exact K = 0 weights if clamping drags them into a window.
    def axb_body(i, dm):
        fxi = fxs[i]  # (1, S)
        axb[i] = _k(fxi.transpose() - vcol).astype(cdt)  # (S, TL)
        if dyn:
            dv = jnp.abs(fys[i] - (rb * rows - m + i).astype(jnp.float32))
            dm = jnp.maximum(dm, jnp.max(jnp.where(dv < 1e8, dv, 0.0)))
        return dm

    dmax = jax.lax.fori_loop(0, srows, axb_body, jnp.float32(0))

    trips_full = (band + _NWAY - 1) // _NWAY
    if dyn:
        d2 = dmax.astype(jnp.int32) + 3  # ceil + |t| < 2 support margin
        trips = jnp.minimum((2 * d2 + 1 + _NWAY - 1) // _NWAY, trips_full)
    else:
        d2 = m
        trips = trips_full

    def row_body(u, _):
        u_abs = (rb * rows + u).astype(jnp.float32)
        s0 = jnp.clip(u + m - d2, 0, srows - trips * _NWAY)

        def band_body(iq, carry):
            accs = []
            for q in range(_NWAY):
                i = s0 + iq * _NWAY + q  # output slab row
                ay_row = _k(fys[i] - u_abs).astype(cdt)  # (1, S)
                gw = gslab[i] * ay_row  # (C, S)
                accs.append(
                    carry[q]
                    + jax.lax.dot(gw, axb[i], preferred_element_type=jnp.float32, precision=_prec(cdt))
                )
            return tuple(accs)

        zero = jnp.zeros((c, tl), jnp.float32)
        accs = jax.lax.fori_loop(0, trips, band_body, (zero,) * _NWAY)
        acc = accs[0]
        for q in range(1, _NWAY):
            acc = acc + accs[q]
        dx_ref[0, u] = acc.astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)


def _dx_scatter_kernel(
    fx_ref, fy_ref, g_ref, out_ref, dslab, sem, *, rows, tl, s_dma, m, c, pb, dyn=True
):
    """d/dx as a scatter-style band: gridded over OUTPUT tiles, where the
    per-row x-weight matrix ax_rᵀ is shared across the whole band — so npack
    input rows' contributions come from ONE (npack·C, TL) @ (TL, S) matmul,
    accumulated into a VMEM slab of pre-packed input rows. Overlapping
    slabs (row/col halos) are composed by a small static overlap-add in XLA
    afterwards. Rows outside each output row's band get K = 0 y-weights, so
    pack alignment costs nothing and no masking code exists.

    ax_rᵀ needs fx varying along sublanes; the row weight matrix is built
    row-oriented like the forward's and transposed once per row (a 2D value
    transpose Mosaic lowers natively — dynamic lane-dim indexing of a
    transposed fx input is NOT provably 128-aligned and does not compile).
    """
    npack = _npack(c)
    unroll = _unroll(c)
    b = pl.program_id(0)
    rb = pl.program_id(1)
    xt = pl.program_id(2)
    y0 = (rb * rows - m).astype(jnp.float32)  # abs input row of slab row 0
    x0 = (xt * tl - m).astype(jnp.float32)  # abs input col of slab col 0
    scol = jax.lax.broadcasted_iota(jnp.int32, (s_dma, tl), 0).astype(jnp.float32) + x0
    cdt = g_ref.dtype

    dslab[...] = jnp.zeros_like(dslab)

    def row_body(r, _):
        fxr = fx_ref[0, pl.ds(r, 1), :]  # (1, TL)
        fyr = fy_ref[0, pl.ds(r, 1), :]
        ax_rt = jnp.transpose(_k(fxr - scol).astype(cdt))  # (TL, S)
        g_r = g_ref[0, r]  # (C, TL)
        if dyn:  # output row r scatters only to its own taps' input rows
            p0, trips = _dyn_window(fyr, y0, npack, unroll, dslab.shape[0], pb)
        else:
            p0, trips = r // npack, pb // unroll

        def band_body(i, _):
            for u_slot in range(unroll):
                pk = p0 + unroll * i + u_slot
                uf = pk.astype(jnp.float32) * float(npack)
                chunks = []
                for q in range(npack):
                    ayq = _k(fyr - (y0 + uf + float(q))).astype(cdt)  # (1, TL)
                    chunks.append(g_r * ayq)  # (C, TL)
                lhs = chunks[0] if npack == 1 else jnp.concatenate(chunks, axis=0)
                p = jax.lax.dot(lhs, ax_rt, preferred_element_type=jnp.float32, precision=_prec(cdt))
                dslab[pk] = dslab[pk] + p  # (npack·C, S)
            return 0

        jax.lax.fori_loop(0, trips, band_body, 0)
        return 0

    jax.lax.fori_loop(0, rows, row_body, 0)
    # out lives in ANY/HBM and is written by one DMA — keeping it out of the
    # pipeline frees VMEM for the fp32 accumulator (bigger row blocks, less
    # halo amplification in the overlap-add)
    cp = pltpu.make_async_copy(dslab, out_ref.at[b, rb, xt], sem)
    cp.start()
    cp.wait()


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------


def _pick_rows_dx(h: int, w: int, c: int, m: int, itemsize: int) -> int:
    """Row block for the scatter dx kernel: the fp32 accumulator slab must
    fit a 9MB VMEM budget (the output is DMA'd straight from it; the rest
    of the ~16MB VMEM goes to the cotangent slab and weight tiles)."""
    del itemsize
    npack = _npack(c)
    tl = min(w, 128)
    s_dma = _round_up(tl + 2 * m, 128)
    r = h
    while r > 8:
        _, p_dx, _ = _pack_geom(h, min(r, h), m, npack, _unroll(c))
        if p_dx * npack * max(c, 8) * s_dma * 4 <= 9 * 1024 * 1024:
            break
        r //= 2
    return max(min(r, h), npack)


def _overlap_add(slabs: jax.Array, h: int, w: int, c: int, m: int, rows: int, tl: int, npack: int):
    """Compose the dx kernel's overlapping per-tile slabs into (B, H, W, C).

    Slab (rb, xt) covers input rows [rb·rows − m, …) and cols
    [xt·tl − m, …): fold the row/col chunk overlaps with a static number
    (≤ 4 each) of shifted adds, then crop the M-halo.
    """
    bdim, nrb, nxt, p_dx, nc, s_dma = slabs.shape
    rows_full = p_dx * npack
    sl = slabs.reshape(bdim, nrb, nxt, rows_full, c, s_dma)

    # --- fold columns across xt (slab col s ↔ abs col xt·tl − m + s) ---
    nch2 = -(-s_dma // tl)
    sl = jnp.pad(sl, ((0, 0),) * 5 + ((0, nch2 * tl - s_dma),))
    sl = sl.reshape(bdim, nrb, nxt, rows_full, c, nch2, tl)
    sl = jnp.transpose(sl, (0, 1, 3, 4, 2, 5, 6))  # (B, nrb, RF, C, nxt, nch2, tl)
    colacc = jnp.zeros(
        (bdim, nrb, rows_full, c, nxt + nch2 - 1, tl), sl.dtype
    )
    for k2 in range(nch2):
        colacc = colacc.at[:, :, :, :, k2 : k2 + nxt, :].add(sl[..., k2, :])
    colacc = colacc.reshape(bdim, nrb, rows_full, c, (nxt + nch2 - 1) * tl)
    colacc = colacc[..., m : m + w]  # crop the column halo

    # --- fold rows across rb (slab row u ↔ abs row rb·rows − m + u) ---
    nch1 = -(-rows_full // rows)
    colacc = jnp.pad(colacc, ((0, 0), (0, 0), (0, nch1 * rows - rows_full), (0, 0), (0, 0)))
    colacc = colacc.reshape(bdim, nrb, nch1, rows, c, w)
    rowacc = jnp.zeros((bdim, nrb + nch1 - 1, rows, c, w), colacc.dtype)
    for k1 in range(nch1):
        rowacc = rowacc.at[:, k1 : k1 + nrb].add(colacc[:, :, k1])
    rowacc = rowacc.reshape(bdim, (nrb + nch1 - 1) * rows, c, w)
    rowacc = rowacc[:, m : m + h]  # crop the row halo
    return jnp.transpose(rowacc, (0, 1, 3, 2))  # NHWC


def _coords(grid: jax.Array, h: int, w: int):
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    fx = ((gx + 1.0) * w - 1.0) * 0.5  # align_corners=False unnormalization
    fy = ((gy + 1.0) * h - 1.0) * 0.5
    return fx, fy


def _packed_input(x_t: jax.Array, h: int, w: int, m: int, wpad: int, npack: int, hp: int):
    """Pad (B, H, C, W) and reshape rows into packs: (B, Hp/npack, npack·C, Wp).

    The reshape is free in HBM (row-major compatible); it exists because
    Mosaic cannot reshape a dynamically sliced value inside the kernel.
    ``hp`` is the caller's _pack_geom padded height — passed in rather than
    re-derived so the pad geometry cannot desynchronize from the caller's
    loop geometry.
    """
    bdim, _, c, _ = x_t.shape
    xp = jnp.pad(x_t, ((0, 0), (m, hp - h - m), (0, 0), (m, wpad - w - m)))
    return xp.reshape(bdim, hp // npack, npack * c, wpad)


def _fwd_call(x, grid, m: int, interpret: bool, note: bool = True, dyn: bool = True):
    b, h, w, c = x.shape
    if _use_small(h, w, c, m, x.dtype.itemsize):
        if dyn == 2:
            raise ValueError(
                "dyn=2 (window-math-only probe mode) is implemented on the "
                "general kernel only; small/grouped maps would silently run "
                "the full dynamic mode and corrupt the probe's attribution"
            )
        return _fwd_small_call(x, grid, m, interpret, note, dyn)
    fx, fy = _coords(grid, h, w)
    rows, tl, s_dma, wpad = _tiles(h, w, c, m, x.dtype.itemsize)
    npack = _npack(c)
    assert rows % npack == 0, (rows, npack)  # pack-aligned slab DMA starts
    if w % tl:
        # the pallas grid visits w // tl column tiles; a remainder would
        # SILENTLY leave the trailing output columns uninitialized
        raise ValueError(f"W={w} must be a multiple of the column tile ({tl})")
    pb, p_slab, hp = _pack_geom(h, rows, m, npack, _unroll(c))
    if note:
        _note_flops(b * h * (w // tl) * pb * 2 * npack * c * s_dma * tl, 32 * b * h * w * c)
    xp = _packed_input(jnp.transpose(x, (0, 1, 3, 2)), h, w, m, wpad, npack, hp)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rows=rows, tl=tl, s_dma=s_dma, m=m, c=c, pb=pb, dyn=dyn),
        grid=(b, h // rows, w // tl),
        in_specs=[
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, c, tl), lambda i, j, k: (i, j, 0, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((p_slab, npack * c, s_dma), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fx, fy, xp)
    return jnp.transpose(out, (0, 1, 3, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _grid_sample_bicubic_pallas_vjp(
    x: jax.Array, grid: jax.Array, max_disp: int, interpret: bool = False, note: bool = True,
    dyn: bool = True,
) -> jax.Array:
    """Fused-kernel bicubic warp; same contract as the banded XLA form.

    ``max_disp`` must bound |sample − output| in pixels plus cubic support
    (use :func:`lcgan_tpu.ops.grid_sample.max_warp_displacement`). H and W
    must be divisible by the row/col tiles (powers of two always are).
    ``note=False`` suppresses the FLOP meter — for probe/A-B callers that
    time the kernel outside a measured step and must not pollute bench.py's
    MFU accounting. (The former two-branch adaptive wrapper also used it;
    that wrapper is retired — the band window is now dynamic IN-kernel.)
    """
    return _fwd_call(x, grid, int(max_disp), interpret, note, dyn)


def _vjp_fwd(x, grid, max_disp, interpret, note, dyn):
    # Residuals are EXACTLY the primal inputs: partial-eval then resolves
    # them to the original arrays instead of outputs of this call, so under
    # jax.checkpoint/remat the recompute graph DCEs the forward kernel
    # entirely (xp is rebuilt in bwd — a pad/transpose, ~1ms vs a kernel).
    return _fwd_call(x, grid, int(max_disp), interpret, note, dyn), (x, grid)


def _vjp_bwd(max_disp, interpret, note, dyn, res, g):
    m = int(max_disp)
    x, grid = res
    x_dtype, grid_dtype = x.dtype, grid.dtype
    b, h, w, c = x.shape
    itemsize = jnp.dtype(x_dtype).itemsize
    if _use_small(h, w, c, m, itemsize):
        dx, dfx, dfy = _bwd_small_call(x, grid, g, m, interpret, note, dyn)
        dgrid = jnp.stack([dfx * (w * 0.5), dfy * (h * 0.5)], axis=-1).astype(grid_dtype)
        return dx, dgrid
    fx, fy = _coords(grid, h, w)
    g_t = jnp.transpose(g, (0, 1, 3, 2)).astype(x_dtype)  # (B, H, C, W)
    rows, tl, s_dma, wpad = _tiles(h, w, c, m, itemsize)
    npack = _npack(c)
    pb, p_slab, hp = _pack_geom(h, rows, m, npack, _unroll(c))
    xp = _packed_input(jnp.transpose(x, (0, 1, 3, 2)), h, w, m, wpad, npack, hp)
    if note:
        _note_flops(
            b * h * (w // tl) * pb * 2 * npack * c * s_dma * 2 * tl, 64 * b * h * w * c
        )

    # ---- d/dgrid: forward-style sweep with K' ----
    dfx, dfy = pl.pallas_call(
        functools.partial(_dgrid_kernel, rows=rows, tl=tl, s_dma=s_dma, m=m, c=c, pb=pb, dyn=dyn),
        grid=(b, h // rows, w // tl),
        in_specs=[
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, rows, c, tl), lambda i, j, k: (i, j, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.VMEM((p_slab, npack * c, s_dma), x_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fx, fy, g_t, xp)

    if c >= 128:
        # gather-dx: transposed band over input tiles. At C >= 128 its
        # matmuls already stream full MXU rows and it avoids the scatter
        # path's HBM slab round-trip (measured faster at 256**2 c128).
        # AXB scratch costs s_dma·tl per slab row on top of the cotangent slab;
        # fold it into the row-block budget.
        rows_dx, _, _, _ = _tiles(
            h, w, c, m, itemsize, extra_row_bytes=s_dma * tl * itemsize + 2 * s_dma * 4
        )
        srows = rows_dx + 2 * m + _overshoot(m)
        band_r = 2 * m + 1 + _overshoot(m)
        if note:
            _note_flops(b * h * (w // tl) * band_r * 2 * c * s_dma * tl, 32 * b * h * w * c)
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
            functools.partial(_dx_gather_kernel, rows=rows_dx, tl=tl, s_dma=s_dma, m=m, c=c, dyn=dyn),
            grid=(b, h // rows_dx, w // tl),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
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
    else:
        # scatter-dx: gridded over output tiles + XLA overlap-add. At
        # C < 128 the gather path wastes most MXU rows (per-band-row rhs
        # defeats m-packing); here the per-row rhs is shared so packs fill
        # the array.
        rows_dx = _pick_rows_dx(h, w, c, m, itemsize)
        pb_dx, p_dx, _ = _pack_geom(h, rows_dx, m, npack, _unroll(c))
        nrb, nxt = h // rows_dx, w // tl
        if note:
            _note_flops(b * h * nxt * pb_dx * 2 * npack * c * tl * s_dma, 32 * b * h * w * c)
        nc = npack * c
        slabs = pl.pallas_call(
            functools.partial(
                _dx_scatter_kernel, rows=rows_dx, tl=tl, s_dma=s_dma, m=m, c=c, pb=pb_dx,
                dyn=dyn,
            ),
            grid=(b, nrb, nxt),
            in_specs=[
                pl.BlockSpec((1, rows_dx, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows_dx, tl), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, rows_dx, c, tl), lambda i, j, k: (i, j, 0, k), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((b, nrb, nxt, p_dx, nc, s_dma), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((p_dx, nc, s_dma), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(fx, fy, g_t)
        dx = _overlap_add(slabs, h, w, c, m, rows_dx, tl, npack).astype(x_dtype)


    # chain through the align_corners=False unnormalization
    dgrid = jnp.stack([dfx * (w * 0.5), dfy * (h * 0.5)], axis=-1).astype(grid_dtype)
    return dx, dgrid


_grid_sample_bicubic_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def grid_sample_bicubic_pallas(
    x: jax.Array, grid: jax.Array, max_disp: int, interpret: bool = False, note: bool = True,
    dyn: bool = True,
) -> jax.Array:
    """Public entry: the custom-VJP kernel call, plus (when a
    `with_executed_flops` wrap is active) the executed-work estimate for
    this call — computed HERE, in the caller's trace scope, because traced
    scalars cannot escape the custom_vjp fwd/bwd traces."""
    if _exec_collect is not None and note:
        _call_flops_estimate(x.shape, jnp.dtype(x.dtype).itemsize, grid, int(max_disp), dyn)
    return _grid_sample_bicubic_pallas_vjp(x, grid, int(max_disp), interpret, note, dyn)


# --------------------------------------------------------------------------
# flow-adaptive band window
# --------------------------------------------------------------------------


def grid_sample_bicubic_pallas_adaptive(
    x: jax.Array, grid: jax.Array, max_disp: int, interpret: bool = False
) -> jax.Array:
    """Back-compat alias: the flow-adaptive band now lives INSIDE the
    kernels (:func:`_dyn_window` — per-row tap-exact windows from the flow
    itself), replacing round 3's two-branch ``lax.cond`` whose scheduling
    barriers cost more than the halved band saved at 512² (G grad
    230 → 257 ms). ``grid_sample_bicubic_pallas`` is adaptive by default;
    this name remains for probes that A/B against ``dyn=False``.
    """
    return grid_sample_bicubic_pallas(x, grid, max_disp, interpret)
