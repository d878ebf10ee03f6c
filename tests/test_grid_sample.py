"""Bicubic grid-sample parity vs torch F.grid_sample (custom_layers.py:165).

This op gates FID parity (it sits inside every synthesis block), so it is
tested against torch for values, out-of-bounds handling, and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lcgan_tpu.ops.grid_sample import (
    grid_sample_bicubic,
    grid_sample_bicubic_banded,
    grid_sample_bicubic_patch,
    identity_like_coordinates,
    max_warp_displacement,
)


def _bounded_grid(rng, b, h, w, scale=0.1):
    """The synthesis-block grid family: (size-1)-normalized identity + tanh flow."""
    coords = np.asarray(identity_like_coordinates(b, h, w))
    flow = np.tanh(rng.standard_normal((b, h, w, 2), dtype=np.float32)) * scale
    return (coords + flow).astype(np.float32)


def test_banded_matches_flat_on_block_grids(rng):
    """The MXU-banded warp == the gather oracle on displacement-bounded
    grids (the only grids the model produces)."""
    b, h, w, c = 2, 16, 16, 5
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    grid = _bounded_grid(rng, b, h, w)
    md = max_warp_displacement(h, 0.1)
    a = grid_sample_bicubic(jnp.asarray(x), jnp.asarray(grid))
    bv = grid_sample_bicubic_banded(jnp.asarray(x), jnp.asarray(grid), md)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bv), rtol=1e-4, atol=1e-5)


def test_banded_matches_torch(rng):
    b, h, w, c = 2, 12, 20, 3  # non-square, W > TL boundary not hit but shape-general
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    grid = _bounded_grid(rng, b, h, w)
    md = max_warp_displacement(max(h, w), 0.1)
    y = grid_sample_bicubic_banded(jnp.asarray(x), jnp.asarray(grid), md)
    np.testing.assert_allclose(np.asarray(y), _torch_ref(x, grid), rtol=1e-4, atol=1e-5)


def test_banded_multi_tile(rng):
    """W > 128 exercises the x-tiling path."""
    b, h, w, c = 1, 8, 256, 2
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    grid = _bounded_grid(rng, b, h, w, scale=0.05)
    md = max_warp_displacement(w, 0.05)
    y = grid_sample_bicubic_banded(jnp.asarray(x), jnp.asarray(grid), md)
    ref = grid_sample_bicubic(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_banded_gradients_match_flat(rng):
    b, h, w, c = 1, 10, 10, 3
    x = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    grid = jnp.asarray(_bounded_grid(rng, b, h, w))
    md = max_warp_displacement(h, 0.1)

    g1 = jax.grad(lambda xx, gg: jnp.sum(jnp.square(grid_sample_bicubic_banded(xx, gg, md))),
                  argnums=(0, 1))(x, grid)
    g2 = jax.grad(lambda xx, gg: jnp.sum(jnp.square(grid_sample_bicubic(xx, gg))),
                  argnums=(0, 1))(x, grid)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-3, atol=1e-4)


def test_patch_formulation_matches_flat_gather(rng):
    """The TPU-optimized patch-gather version == the 16-gather oracle,
    including far-out-of-bounds sample points."""
    b, h, w, c = 2, 8, 10, 3
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    grid = rng.uniform(-1.8, 1.8, (b, 6, 7, 2)).astype(np.float32)
    a = grid_sample_bicubic(jnp.asarray(x), jnp.asarray(grid))
    bv = grid_sample_bicubic_patch(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(a), np.asarray(bv), rtol=1e-4, atol=1e-5)


def test_patch_formulation_matches_torch(rng):
    b, h, w, c = 2, 9, 9, 4
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    grid = rng.uniform(-1.2, 1.2, (b, h, w, 2)).astype(np.float32)
    y = grid_sample_bicubic_patch(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(y), _torch_ref(x, grid), rtol=1e-4, atol=1e-5)


def test_patch_formulation_gradients(rng):
    b, h, w, c = 1, 6, 6, 2
    x = jnp.asarray(rng.standard_normal((b, h, w, c), dtype=np.float32))
    grid = jnp.asarray(rng.uniform(-0.8, 0.8, (b, h, w, 2)).astype(np.float32))

    def loss(xx, gg):
        return jnp.sum(jnp.square(grid_sample_bicubic_patch(xx, gg)))

    gx1, gg1 = jax.grad(loss, argnums=(0, 1))(x, grid)

    def loss_ref(xx, gg):
        return jnp.sum(jnp.square(grid_sample_bicubic(xx, gg)))

    gx2, gg2 = jax.grad(loss_ref, argnums=(0, 1))(x, grid)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gg1), np.asarray(gg2), rtol=1e-3, atol=1e-4)


def _torch_ref(x_nhwc, grid):
    xt = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2).copy())
    gt = torch.from_numpy(grid.copy())
    y = F.grid_sample(xt, gt, mode="bicubic", padding_mode="zeros", align_corners=False)
    return y.numpy().transpose(0, 2, 3, 1)


def test_grid_sample_bicubic_matches_torch_inbounds(rng):
    b, h, w, c = 2, 10, 12, 3
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    grid = rng.uniform(-0.7, 0.7, (b, h, w, 2)).astype(np.float32)
    y = grid_sample_bicubic(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(y), _torch_ref(x, grid), rtol=1e-4, atol=1e-5)


def test_grid_sample_bicubic_matches_torch_outofbounds(rng):
    b, h, w, c = 2, 8, 8, 2
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    grid = rng.uniform(-1.6, 1.6, (b, h, w, 2)).astype(np.float32)  # many OOB taps
    y = grid_sample_bicubic(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(y), _torch_ref(x, grid), rtol=1e-4, atol=1e-5)


def test_grid_sample_warp_path_like_synthesis_block(rng):
    """The exact usage pattern: align_corners=True-style coords + small flow."""
    b, h, w, c = 2, 16, 16, 4
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    flow = np.tanh(rng.standard_normal((b, h, w, 2), dtype=np.float32)) * 0.1
    coords = np.asarray(identity_like_coordinates(b, h, w))
    grid = (coords + flow).astype(np.float32)
    y = grid_sample_bicubic(jnp.asarray(x), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(y), _torch_ref(x, grid), rtol=1e-4, atol=1e-5)


def test_grid_sample_gradients_match_torch(rng):
    b, h, w, c = 1, 6, 6, 2
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    grid = rng.uniform(-0.8, 0.8, (b, h, w, 2)).astype(np.float32)

    def loss_j(xx, gg):
        return jnp.sum(jnp.square(grid_sample_bicubic(xx, gg)))

    gx, gg = jax.grad(loss_j, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(grid))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy()).requires_grad_(True)
    gt = torch.from_numpy(grid.copy()).requires_grad_(True)
    y = F.grid_sample(xt, gt, mode="bicubic", padding_mode="zeros", align_corners=False)
    y.square().sum().backward()
    np.testing.assert_allclose(
        np.asarray(gx), xt.grad.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(gg), gt.grad.numpy(), rtol=1e-3, atol=1e-3)


def test_identity_like_coordinates_layout():
    coords = np.asarray(identity_like_coordinates(1, 4, 6))
    assert coords.shape == (1, 4, 6, 2)
    # channel 0 is x (varies along width), normalized by (size-1)
    np.testing.assert_allclose(coords[0, 0, :, 0], np.linspace(-1, 1, 6), atol=1e-6)
    np.testing.assert_allclose(coords[0, :, 0, 1], np.linspace(-1, 1, 4), atol=1e-6)


def test_banded_rejects_partial_tiles(rng):
    """W not divisible by the 64-col tile must fail loudly, not corrupt the
    right edge (the fixed-size window slice would clamp silently)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 100, 3), dtype=np.float32))
    grid = identity_like_coordinates(1, 8, 100)
    with pytest.raises(ValueError, match="banded warp requires"):
        grid_sample_bicubic_banded(x, grid, 4)
