"""Mapping network properties + loss golden values vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from lcgan_tpu.losses import bce_logits, contrastive_loss, r1_penalty_with_logits, sparsity_loss
from lcgan_tpu.ops.mapping import MappingNetwork, ProjectionHead, orthogonalize


def test_orthogonalize_produces_orthonormal_q(rng):
    m = rng.standard_normal((16, 16), dtype=np.float32)
    q = np.asarray(orthogonalize(jnp.asarray(np.tanh(m))))
    np.testing.assert_allclose(q.T @ q, np.eye(16), atol=1e-5)


def test_mapping_network_is_linear_in_z(rng):
    """The whole mapping (L z then activation-free MLP) is linear in z
    (custom_layers.py:268-287). Run in x64: random 8×8 matrix chains are
    ill-conditioned enough that fp32 rounding masks the check."""
    with jax.enable_x64(True):
        net = MappingNetwork([8, 8, 8, 8], dtype=jnp.float64)
        z1 = jnp.asarray(rng.standard_normal((4, 8)))
        z2 = jnp.asarray(rng.standard_normal((4, 8)))
        params = net.init(jax.random.PRNGKey(0), z1)
        params = jax.tree.map(lambda p: p.astype(jnp.float64), params)

        f = lambda z: net.apply(params, z)
        lhs = f(2.5 * z1 - 1.5 * z2)
        rhs = 2.5 * f(z1) - 1.5 * f(z2)  # f(0) == 0: biases init to 0
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(f(jnp.zeros_like(z1))), 0.0, atol=1e-12)


def test_mapping_network_channels(rng):
    """Geometry [64, 64×12] and appearance [64,128,256,512×10] plumbing."""
    geo = MappingNetwork([64] + [64] * 12)
    z = jnp.asarray(rng.standard_normal((2, 64), dtype=np.float32))
    p = geo.init(jax.random.PRNGKey(0), z)
    assert geo.apply(p, z).shape == (2, 64)
    assert len([k for k in p["params"] if k.startswith("mlp_")]) == 12

    app = MappingNetwork([64, 128, 256] + [512] * 10)
    p = app.init(jax.random.PRNGKey(0), z)
    assert app.apply(p, z).shape == (2, 512)
    assert p["params"]["diagonal_params"].shape == (64,)
    assert p["params"]["basis_params"].shape == (64, 64)


def test_projection_head_structure(rng):
    head = ProjectionHead([32, 16, 8])
    x = jnp.asarray(rng.standard_normal((3, 32), dtype=np.float32))
    p = head.init(jax.random.PRNGKey(0), x)
    assert head.apply(p, x).shape == (3, 8)


def test_contrastive_loss_matches_torch(rng):
    b, n = 6, 16
    a = rng.standard_normal((b, n), dtype=np.float32)
    p = rng.standard_normal((b, n), dtype=np.float32)
    ng = rng.standard_normal((b, n), dtype=np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    ng /= np.linalg.norm(ng, axis=1, keepdims=True)
    tau = 0.05

    got = contrastive_loss(jnp.asarray(a), jnp.asarray(p), jnp.asarray(ng), tau)

    at, pt, nt = map(torch.from_numpy, (a, p, ng))
    exp_p = torch.exp(torch.bmm(at.view(b, 1, n), pt.view(b, n, 1)).squeeze() / tau)
    exp_n = torch.exp(torch.bmm(at.view(b, 1, n), nt.view(b, n, 1)).squeeze() / tau)
    ref = (-torch.log(exp_p / (exp_p + exp_n))).mean()
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)


def test_bce_logits_matches_torch(rng):
    logit = rng.standard_normal((8, 1), dtype=np.float32)
    lt = torch.from_numpy(logit)
    ones = torch.ones(8, 1)
    zeros = torch.zeros(8, 1)
    np.testing.assert_allclose(
        float(bce_logits(jnp.asarray(logit), 1.0)),
        float(F.binary_cross_entropy_with_logits(lt, ones)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(bce_logits(jnp.asarray(logit), 0.0)),
        float(F.binary_cross_entropy_with_logits(lt, zeros)),
        rtol=1e-5,
    )


def test_r1_penalty_matches_torch(rng):
    """R1 on a quadratic 'discriminator' with analytically known gradient."""
    b, h, w, c = 4, 5, 5, 3
    images = rng.standard_normal((b, h, w, c), dtype=np.float32)
    kernel = rng.standard_normal((h, w, c), dtype=np.float32)

    def logit_fn(img):  # (B,1) logit: quadratic so grad depends on img
        return jnp.sum(jnp.square(img) * kernel, axis=(1, 2, 3), keepdims=False)[:, None]

    logits, r1 = r1_penalty_with_logits(logit_fn, jnp.asarray(images))
    # analytic: dD/dx = 2*k*x ; r1 = 0.5*mean_b sum (2kx)^2
    g = 2.0 * kernel[None] * images
    expect = 0.5 * np.mean(np.sum((g**2).reshape(b, -1), axis=1))
    np.testing.assert_allclose(float(r1), expect, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logits)[:, 0],
        np.sum((images**2) * kernel[None], axis=(1, 2, 3)),
        rtol=1e-4,
    )


def test_r1_is_twice_differentiable(rng):
    """The outer step must differentiate through R1 (loss.py:18-34)."""
    w = jnp.asarray(rng.standard_normal((4, 1), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((3, 2, 2, 1), dtype=np.float32))

    def d_loss(w):
        def logit_fn(img):
            return jnp.tanh(img.reshape(img.shape[0], -1) @ w)

        _, r1 = r1_penalty_with_logits(logit_fn, x)
        return r1

    g = jax.grad(d_loss)(w)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_sparsity_loss(rng):
    d1 = rng.standard_normal(8).astype(np.float32)
    d2 = rng.standard_normal(16).astype(np.float32)
    got = float(sparsity_loss(jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_allclose(got, np.abs(np.concatenate([d1, d2])).sum(), rtol=1e-5)
