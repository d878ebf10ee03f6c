"""Fused Pallas warp kernel parity (interpret mode on CPU).

The kernel must match the gather oracle (`grid_sample_bicubic`, itself
torch-parity-tested in test_grid_sample.py) for values and the banded XLA
form for both gradients, across single/multi x-tile geometries, odd
channel counts, and asymmetric H≠W.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcgan_tpu.ops.grid_sample import (
    grid_sample_bicubic,
    grid_sample_bicubic_banded,
    identity_like_coordinates,
    max_warp_displacement,
)
from lcgan_tpu.ops.warp_pallas import grid_sample_bicubic_pallas

SHAPES = [
    ((2, 16, 16, 8), 0.1),
    ((1, 8, 8, 32), 0.1),
    ((2, 32, 64, 16), 0.05),
    ((1, 16, 256, 8), 0.05),  # multi-x-tile: exercises 128-aligned DMA windows
    ((1, 16, 16, 128), 0.1),  # c >= 128: exercises the gather-dx backward path
    ((1, 16, 16, 48), 0.1),  # non-pow2 channels: npack must round down to pow2
    ((1, 16, 16, 512), 0.1),  # small-map channel-group split (VMEM budget)
]


def _case(shape, mfs, rng):
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2)), jnp.float32)
    grid = identity_like_coordinates(b, h, w) + flow * mfs
    m = max_warp_displacement(max(h, w), mfs)
    return x, grid, m


@pytest.mark.parametrize("shape,mfs", SHAPES)
def test_fwd_matches_gather_oracle(shape, mfs, rng):
    x, grid, m = _case(shape, mfs, rng)
    ref = grid_sample_bicubic(x, grid)
    out = grid_sample_bicubic_pallas(x, grid, m, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("shape,mfs", SHAPES[:2] + SHAPES[3:])  # both dx paths
def test_grads_match_banded(shape, mfs, rng):
    x, grid, m = _case(shape, mfs, rng)
    cot = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss_p(x_, g_):
        return jnp.sum(grid_sample_bicubic_pallas(x_, g_, m, True) * cot)

    def loss_r(x_, g_):
        return jnp.sum(grid_sample_bicubic_banded(x_, g_, m) * cot)

    dx_p, dg_p = jax.grad(loss_p, argnums=(0, 1))(x, grid)
    dx_r, dg_r = jax.grad(loss_r, argnums=(0, 1))(x, grid)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_r), atol=2e-2)


@pytest.mark.parametrize("small_flow", [True, False])
def test_adaptive_band_matches_oracle_both_branches(small_flow, rng):
    """The flow-adaptive warp must be exact on BOTH cond branches: a small
    flow routes to the half-band kernel, a near-bound flow falls back to
    the full band — values AND both gradients match the banded form."""
    from lcgan_tpu.ops.warp_pallas import (
        _adaptive_pick,
        grid_sample_bicubic_pallas_adaptive,
    )

    # c=128 (npack=2): the ratio gate engages the cond at this geometry;
    # tiny channel counts fall back (npack granularity swallows the band cut)
    b, h, w, c = 1, 16, 256, 128  # multi-x-tile geometry, m=9 -> m_h=5
    mfs = 0.05
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 2)), jnp.float32)
    scale = 0.2 if small_flow else 1.0  # 0.2: |disp| well under m_h - 2
    grid = identity_like_coordinates(b, h, w) + flow * mfs * scale
    m = max_warp_displacement(max(h, w), mfs)
    m_h = _adaptive_pick(h, w, c, m, 4)
    assert m_h is not None and m_h < m  # the cond engages at this geometry
    cot = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)

    out = jax.jit(
        lambda x_, g_: grid_sample_bicubic_pallas_adaptive(x_, g_, m, True)
    )(x, grid)
    ref = grid_sample_bicubic_banded(x, grid, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def loss_a(x_, g_):
        return jnp.sum(grid_sample_bicubic_pallas_adaptive(x_, g_, m, True) * cot)

    def loss_r(x_, g_):
        return jnp.sum(grid_sample_bicubic_banded(x_, g_, m) * cot)

    dx_a, dg_a = jax.jit(jax.grad(loss_a, argnums=(0, 1)))(x, grid)
    dx_r, dg_r = jax.grad(loss_r, argnums=(0, 1))(x, grid)
    np.testing.assert_allclose(np.asarray(dx_a), np.asarray(dx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dg_a), np.asarray(dg_r), atol=2e-2)


def test_adaptive_band_branch_selection(rng):
    """The predicate routes by measured displacement: identity-ish grids take
    the half-band branch (checked via the FLOP meter, which only the fast
    branch reports to)."""
    from lcgan_tpu.ops.warp_pallas import (
        flop_meter,
        grid_sample_bicubic_pallas_adaptive,
    )

    # c=128 (npack=2): the half band materializes as fewer packed matmuls;
    # at tiny channel counts npack=8 granularity can swallow the reduction
    b, h, w, c = 1, 16, 256, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    grid = identity_like_coordinates(b, h, w)
    m = max_warp_displacement(max(h, w), 0.05)
    with flop_meter() as acc:
        jax.jit(lambda x_, g_: grid_sample_bicubic_pallas_adaptive(x_, g_, m, True)).lower(
            x, grid
        )
    assert acc[0] > 0  # fast branch noted
    with flop_meter() as acc_full:
        jax.jit(lambda x_, g_: grid_sample_bicubic_pallas(x_, g_, m, True)).lower(x, grid)
    assert 0 < acc[0] < acc_full[0]  # ... and it is cheaper than the full band


def test_bf16_smoke(rng):
    """bf16 path: fwd+grads run and stay close to the fp32 oracle."""
    (shape, mfs) = SHAPES[0]
    x, grid, m = _case(shape, mfs, rng)
    out = grid_sample_bicubic_pallas(x.astype(jnp.bfloat16), grid, m, True)
    assert out.dtype == jnp.bfloat16
    ref = grid_sample_bicubic(x, grid)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.1
    )

    def loss(x_, g_):
        return jnp.sum(grid_sample_bicubic_pallas(x_, g_, m, True).astype(jnp.float32))

    dx, dg = jax.grad(loss, argnums=(0, 1))(x.astype(jnp.bfloat16), grid)
    assert dx.dtype == jnp.bfloat16 and bool(jnp.all(jnp.isfinite(dg)))
