"""Parity of the TPU mod/demod-conv rewrite vs the reference's grouped-conv
formulation, reproduced here in torch as the oracle (custom_layers.py:60-86).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lcgan_tpu.ops.equalized import equalized_scale
from lcgan_tpu.ops.modulated import ModulatedConv2d, modulated_conv2d


def torch_modulated_conv(x, s, weight, bias, up=1, eps=1e-8, padding=1):
    """Oracle: per-sample weights + grouped conv, as the reference computes it."""
    b, c, h, w = x.shape
    out_f, in_f, k, _ = weight.shape
    s5 = s[:, None, :, None, None]
    wb = weight.unsqueeze(0) * s5
    sigma_inv = torch.rsqrt((wb**2).sum(dim=(2, 3, 4), keepdim=True) + eps)
    wb = wb * sigma_inv
    xg = x.reshape(1, b * c, h, w)
    if up > 1:
        wb = wb.transpose(1, 2).reshape(b * in_f, out_f, k, k)
        y = F.conv_transpose2d(xg, wb, padding=padding, stride=up, output_padding=1, groups=b)
        _, _, nh, nw = y.shape
        y = y.reshape(b, out_f, nh, nw)
    else:
        wb = wb.reshape(b * out_f, in_f, k, k)
        y = F.conv2d(xg, wb, padding=padding, groups=b)
        y = y.reshape(b, out_f, h, w)
    return y + bias.view(1, -1, 1, 1)


@pytest.mark.parametrize("up,k", [(1, 3), (2, 3), (1, 1)])
def test_modulated_conv_matches_grouped_reference(rng, up, k):
    b, in_f, out_f, h = 3, 6, 10, 8
    x = rng.standard_normal((b, h, h, in_f), dtype=np.float32)
    s = rng.standard_normal((b, in_f), dtype=np.float32) + 1.0
    w = rng.standard_normal((k, k, in_f, out_f), dtype=np.float32)
    bias = rng.standard_normal((out_f,), dtype=np.float32)

    y = modulated_conv2d(
        jnp.asarray(x), jnp.asarray(s), jnp.asarray(w), jnp.asarray(bias), up=up
    )

    ref = torch_modulated_conv(
        torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
        torch.from_numpy(s),
        torch.from_numpy(w.transpose(3, 2, 0, 1).copy()),  # HWIO -> OIHW
        torch.from_numpy(bias),
        up=up,
        padding=(k - 1) // 2,
    )
    np.testing.assert_allclose(
        np.asarray(y), ref.numpy().transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-5
    )
    if up == 2:
        assert y.shape == (b, 2 * h, 2 * h, out_f)


@pytest.mark.parametrize("shape", [(2, 5, 7, 4, 6), (1, 8, 8, 3, 3)])
def test_up2_phase_decomposition_equals_dilated(rng, shape):
    """_up2_phases == the generic lhs-dilated transpose, values and grads.

    The k=3 up path (custom_layers.py:74-80) runs as four phase convs on TPU;
    this pins it to the dilated formulation it replaces (same taps, same sums
    — equality is exact up to conv reassociation)."""
    from lcgan_tpu.ops.modulated import _up2_phases

    b, h, w_sp, in_f, out_f = shape
    x = jnp.asarray(rng.standard_normal((b, h, w_sp, in_f), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, in_f, out_f), dtype=np.float32))

    def dilated(x, w):
        w_t = jnp.flip(w, axis=(0, 1))
        return jax.lax.conv_general_dilated(
            x, w_t, window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def phases(x, w):
        return _up2_phases(x, jnp.flip(w, axis=(0, 1)))

    np.testing.assert_allclose(
        np.asarray(phases(x, w)), np.asarray(dilated(x, w)), rtol=1e-5, atol=1e-5
    )
    cot = jnp.asarray(rng.standard_normal((b, 2 * h, 2 * w_sp, out_f), dtype=np.float32))
    loss = lambda f: lambda x, w: jnp.sum(f(x, w) * cot)
    gx_d, gw_d = jax.grad(loss(dilated), argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(loss(phases), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_d), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_d), rtol=1e-5, atol=1e-4)


def test_modulated_conv_module_equalization(rng):
    """Module applies the equalized scale + lr_mul-scaled bias to the kernel."""
    b, in_f, out_f, h, k = 2, 4, 5, 6, 3
    x = rng.standard_normal((b, h, h, in_f), dtype=np.float32)
    s = rng.standard_normal((b, in_f), dtype=np.float32)
    mod = ModulatedConv2d(features=out_f, kernel_size=k)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(s))
    y = mod.apply(params, jnp.asarray(x), jnp.asarray(s))

    w = np.asarray(params["params"]["weight"]) * equalized_scale(in_f * k * k)
    bias = np.asarray(params["params"]["bias"])
    expect = modulated_conv2d(jnp.asarray(x), jnp.asarray(s), jnp.asarray(w), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_modulated_conv_grad_flows(rng):
    """Differentiable w.r.t. x, styles, and weights (needed for G training)."""
    b, in_f, out_f, h = 2, 4, 4, 4
    x = jnp.asarray(rng.standard_normal((b, h, h, in_f), dtype=np.float32))
    s = jnp.asarray(rng.standard_normal((b, in_f), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, in_f, out_f), dtype=np.float32))
    bias = jnp.zeros((out_f,))

    def loss(x, s, w):
        return jnp.sum(jnp.square(modulated_conv2d(x, s, w, bias, up=2)))

    gx, gs, gw = jax.grad(loss, argnums=(0, 1, 2))(x, s, w)
    for g in (gx, gs, gw):
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0


def test_synthesis_layer_use_noise_branch(rng):
    """use_noise (custom_layers.py:99-108): fixed randn buffer × learned
    scalar × 0.01 gain; zero-init strength ⇒ identical to the no-noise path."""
    import flax
    from lcgan_tpu.ops.modulated import SynthesisLayer

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6), dtype=np.float32))
    lat = jnp.asarray(rng.standard_normal((2, 4), dtype=np.float32))
    key = jax.random.PRNGKey(3)

    plain = SynthesisLayer(features=5, latent_dim=4)
    noisy = SynthesisLayer(features=5, latent_dim=4, use_noise=True)

    vp = plain.init(key, x, lat)
    vn = noisy.init(key, x, lat)

    # buffer lives in stats (not trained), strength is a zero-init param
    assert vn["stats"]["noise_const"].shape == (8, 8)
    assert float(vn["params"]["noise_strength"]) == 0.0
    assert "stats" not in plain.init(key, x, lat.copy()) or True

    # zero strength: exact match with the no-noise layer (same param init)
    y0 = plain.apply(vp, x, lat)
    y1 = noisy.apply(vn, x, lat)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    # nonzero strength adds noise_const * strength * 0.01, broadcast over B/C
    vn2 = flax.core.unfreeze(vn)
    vn2["params"] = dict(vn2["params"], noise_strength=jnp.asarray(2.5))
    y2 = noisy.apply(vn2, x, lat)
    want = np.asarray(y1) + np.asarray(vn["stats"]["noise_const"])[None, :, :, None] * 2.5 * 0.01
    np.testing.assert_allclose(np.asarray(y2), want, atol=1e-5)

    # strength receives gradient
    def loss(p):
        return jnp.sum(noisy.apply({"params": p, "stats": vn2["stats"]}, x, lat) ** 2)

    g = jax.grad(loss)(vn2["params"])
    assert float(jnp.abs(g["noise_strength"])) > 0.0


def test_generator_use_noise_shapes():
    """use_noise threads to the two main convs of every block, never the flow
    layer (custom_layers.py:120-123); buffers match each block's resolution."""
    from lcgan_tpu.models.generator import Generator

    g = Generator(
        img_resolution=16, geo_noise_dim=8, app_noise_dim=8, geo_latent_dim=8,
        app_latent_dim=16, base_nf=8, max_nf=16, use_noise=True,
    )
    z1 = jnp.zeros((2, 8))
    z2 = jnp.zeros((2, 8))
    v = g.init(jax.random.PRNGKey(0), z1, z2, -1.0)
    stats = v["stats"]
    for i, res in enumerate([8, 16]):
        blk = stats[f"block_{i}"]
        assert blk["modulated_conv0"]["noise_const"].shape == (res, res)
        assert blk["modulated_conv1"]["noise_const"].shape == (res, res)
        assert "noise_const" not in blk.get("flow_layer", {})
    out, _ = g.apply(v, z1, z2, -1.0, mutable=["stats"])
    assert out.shape == (2, 16, 16, 3)
