"""Golden-value unit tests for the op library against torch functionals.

torch (CPU) is used ONLY as an oracle for operator semantics the reference
relies on (conv/avg_pool/grid_sample/linear); tolerances are fp32-level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lcgan_tpu.ops.equalized import EqualizedConv2d, EqualizedLinear, equalized_scale
from lcgan_tpu.ops.filters import avg_pool_2x2, box_filter_3x3, leaky_relu, nearest_upsample_2x
from lcgan_tpu.ops.mbstd import minibatch_stddev


def nchw(x):  # jax NHWC -> torch NCHW
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())


def nhwc(t):  # torch NCHW -> numpy NHWC
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_equalized_scale():
    # custom_layers.py:10 — c = 1/sqrt(prod(shape[1:])) * lr_mul
    assert np.isclose(equalized_scale(64, 1.0), 1.0 / np.sqrt(64))
    assert np.isclose(equalized_scale(3 * 9, 0.01), 0.01 / np.sqrt(27))


def test_equalized_linear_matches_torch(rng):
    x = rng.standard_normal((4, 16), dtype=np.float32)
    lin = EqualizedLinear(features=8, bias_init=1.0, lr_mul=0.01)
    params = lin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = lin.apply(params, jnp.asarray(x))

    w = np.asarray(params["params"]["weight"])  # (in, out)
    b = np.asarray(params["params"]["bias"])
    # torch: F.linear(x, weight*c, bias*lr_mul) with weight (out, in)
    ref = F.linear(
        torch.from_numpy(x),
        torch.from_numpy((w * equalized_scale(16, 0.01)).T.copy()),
        torch.from_numpy(b * 0.01),
    )
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), rtol=1e-5, atol=1e-6)
    # bias param initialized to the constant (scaled only in forward)
    np.testing.assert_allclose(b, np.ones(8), rtol=0, atol=0)


@pytest.mark.parametrize("stride", [1, 2])
def test_equalized_conv_matches_torch(rng, stride):
    x = rng.standard_normal((2, 8, 8, 5), dtype=np.float32)
    conv = EqualizedConv2d(features=7, kernel_size=3, stride=stride)
    params = conv.init(jax.random.PRNGKey(1), jnp.asarray(x))
    y = conv.apply(params, jnp.asarray(x))

    w = np.asarray(params["params"]["weight"])  # HWIO
    b = np.asarray(params["params"]["bias"])
    w_t = torch.from_numpy((w * equalized_scale(5 * 9)).transpose(3, 2, 0, 1).copy())  # OIHW
    ref = F.conv2d(nchw(x), w_t, bias=torch.from_numpy(b), stride=stride, padding=1)
    np.testing.assert_allclose(np.asarray(y), nhwc(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("c,co,hw,p", [
    (32, 32, 16, 4),
    (5, 16, 8, 8),
    (32, 32, 4, 4),
    (32, 32, 16, 8),   # lane-target-256 pack (the r3 production rule at c32)
    (64, 64, 16, 4),   # c64 pack candidate (p·Co = 256 lanes)
])
def test_conv3x3_packed_matches_dilated(rng, c, co, hw, p):
    """Width-packed matmul form == the dilated conv, values and grads."""
    from lcgan_tpu.ops.equalized import conv3x3_packed
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.1, jnp.float32)

    def ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )

    got = conv3x3_packed(x, w, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x, w)), rtol=2e-5, atol=1e-5)

    def loss(f):
        def inner(x, w):
            y = f(x, w)
            return jnp.sum(y * jnp.cos(y.astype(jnp.float32)).astype(y.dtype))
        return inner

    gx_r, gw_r = jax.grad(loss(ref), argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(loss(lambda a, b: conv3x3_packed(a, b, p)), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=2e-4, atol=1e-4)


def test_equalized_conv_packed_route_matches_torch(rng, monkeypatch):
    """EqualizedConv2d with Co ≤ 32 routes through the packed path — still torch-exact."""
    from lcgan_tpu.ops import equalized

    monkeypatch.setattr(equalized, "PACKED_K3_MIN_RES", 8)  # force the route at test size
    x = rng.standard_normal((2, 8, 8, 24), dtype=np.float32)
    conv = EqualizedConv2d(features=32, kernel_size=3)
    params = conv.init(jax.random.PRNGKey(3), jnp.asarray(x))
    y = conv.apply(params, jnp.asarray(x))
    w = np.asarray(params["params"]["weight"])
    b = np.asarray(params["params"]["bias"])
    w_t = torch.from_numpy((w * equalized_scale(24 * 9)).transpose(3, 2, 0, 1).copy())
    ref = F.conv2d(nchw(x), w_t, bias=torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(np.asarray(y), nhwc(ref), rtol=1e-4, atol=1e-5)


def test_box_filter_matches_torch_avgpool(rng):
    x = rng.standard_normal((2, 9, 9, 4), dtype=np.float32)
    y = box_filter_3x3(jnp.asarray(x))
    ref = F.avg_pool2d(nchw(x), kernel_size=3, stride=1, padding=1)  # count_include_pad=True
    np.testing.assert_allclose(np.asarray(y), nhwc(ref), rtol=1e-5, atol=1e-6)


def test_avg_pool_2x2_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    y = avg_pool_2x2(jnp.asarray(x))
    ref = F.avg_pool2d(nchw(x), kernel_size=2, stride=2, padding=0)
    np.testing.assert_allclose(np.asarray(y), nhwc(ref), rtol=1e-5, atol=1e-6)


def test_nearest_upsample_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 3), dtype=np.float32)
    y = nearest_upsample_2x(jnp.asarray(x))
    ref = F.interpolate(nchw(x), scale_factor=2, mode="nearest")
    np.testing.assert_allclose(np.asarray(y), nhwc(ref), rtol=0, atol=0)


def test_leaky_relu_gain(rng):
    x = rng.standard_normal((3, 4), dtype=np.float32)
    y = leaky_relu(jnp.asarray(x), 0.2, np.sqrt(2))
    ref = F.leaky_relu(torch.from_numpy(x), 0.2) * np.sqrt(2)
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("n,g", [(8, 8), (8, 4), (6, 8), (4, 2)])
def test_mbstd_matches_torch_reference(rng, n, g):
    """Oracle: the exact torch formulation of custom_layers.py:243-256."""
    c, h, w = 6, 4, 4
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    y = minibatch_stddev(jnp.asarray(x), group_size=g)

    xt = nchw(x)
    gg = min(g, n)
    f = 1
    cc = c // f
    yt = xt.reshape(gg, -1, f, cc, h, w)
    yt = yt - yt.mean(dim=0)
    yt = yt.square().mean(dim=0)
    yt = (yt + 1e-8).sqrt()
    yt = yt.mean(dim=[2, 3, 4])
    yt = yt.reshape(-1, f, 1, 1)
    yt = yt.repeat(gg, 1, h, w)
    ref = torch.cat([xt, yt], dim=1)
    np.testing.assert_allclose(np.asarray(y), nhwc(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("views,b", [(3, 4), (4, 2), (2, 8)])
def test_mbstd_num_views_equals_separate_calls(rng, views, b):
    """num_views>1 must equal running each view through mbstd separately
    (the contract the view-batched train step relies on)."""
    c, h, w = 6, 4, 4
    x = rng.standard_normal((views * b, h, w, c), dtype=np.float32)
    got = minibatch_stddev(jnp.asarray(x), group_size=4, num_views=views)
    want = jnp.concatenate(
        [minibatch_stddev(jnp.asarray(x[v * b : (v + 1) * b]), group_size=4) for v in range(views)],
        axis=0,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)


def test_pack_p_rule():
    """p = min(8, LANE_TARGET//Co), halved until it divides the map width."""
    from lcgan_tpu.ops import equalized

    assert equalized._pack_p(32, 1024) == 8    # 256//32, two lane tiles
    assert equalized._pack_p(64, 512) == 4
    assert equalized._pack_p(128, 256) == 2
    assert equalized._pack_p(256, 256) == 1    # cannot pack
    assert equalized._pack_p(32, 12) == 4      # 12 % 8 != 0 → halve
    assert equalized._pack_p(32, 10) == 2
    assert equalized._pack_p(32, 7) == 1       # odd width: no pack divides
