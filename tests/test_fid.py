"""FID math + Inception model plumbing tests (weights-independent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lcgan_tpu.eval.fid import calc_fid
from lcgan_tpu.eval.inception import InceptionV3FID, _avg_pool_cip_false


def test_calc_fid_zero_for_identical_distributions(rng):
    feats = rng.standard_normal((100, 8))
    mean, cov = feats.mean(0), np.cov(feats, rowvar=False)
    assert abs(calc_fid(mean, cov, mean, cov)) < 1e-6


def test_calc_fid_analytic_isotropic():
    """For N(m1, aI) vs N(m2, bI): FID = ||m1-m2||² + d(a + b - 2√(ab))."""
    d = 6
    m1, m2 = np.zeros(d), np.full(d, 0.5)
    a, b = 2.0, 0.5
    got = calc_fid(m1, np.eye(d) * a, m2, np.eye(d) * b)
    expect = 0.25 * d + d * (a + b - 2 * np.sqrt(a * b))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_avg_pool_count_include_pad_false_matches_torch(rng):
    """The TF-FID patch (eval/inception.py:209-211)."""
    x = rng.standard_normal((2, 7, 7, 3), dtype=np.float32)
    y = _avg_pool_cip_false(jnp.asarray(x))
    ref = F.avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
        kernel_size=3, stride=1, padding=1, count_include_pad=False,
    )
    np.testing.assert_allclose(np.asarray(y), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_inception_feature_shape():
    """2048-d pool3 features from a small input (resized to 299 internally)."""
    model = InceptionV3FID()
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert feats.shape == (2, 2048)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_bn_folding_matches_batchnorm_inference(rng):
    """Folded scale/bias == conv→BN(eval) for the FID Inception conversion."""
    import torch.nn as nn

    from lcgan_tpu.eval.convert import _fold_basic_conv

    conv = nn.Conv2d(3, 8, 3, bias=False)
    bn = nn.BatchNorm2d(8, eps=1e-3)
    bn.weight.data = torch.from_numpy(rng.standard_normal(8, dtype=np.float32))
    bn.bias.data = torch.from_numpy(rng.standard_normal(8, dtype=np.float32))
    bn.running_mean.data = torch.from_numpy(rng.standard_normal(8, dtype=np.float32))
    bn.running_var.data = torch.from_numpy(rng.random(8, dtype=np.float32) + 0.5)
    bn.eval()

    sd = {
        "m.conv.weight": conv.weight.detach(),
        "m.bn.weight": bn.weight.detach(),
        "m.bn.bias": bn.bias.detach(),
        "m.bn.running_mean": bn.running_mean.detach(),
        "m.bn.running_var": bn.running_var.detach(),
    }
    folded = _fold_basic_conv(sd, "m")

    x = torch.from_numpy(rng.standard_normal((2, 3, 8, 8), dtype=np.float32))
    ref = bn(conv(x)).detach().numpy()

    w = jnp.asarray(folded["weight"])  # HWIO
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), w, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=jax.lax.Precision.HIGHEST,
    )
    y = y * folded["bn_scale"] + folded["bn_bias"]
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5
    )


def test_convert_npz_roundtrip(tmp_path):
    from lcgan_tpu.eval.convert import load_params_npz, save_params_npz

    params = {"A": {"b": np.ones((2, 2)), "c": {"d": np.zeros(3)}}}
    p = str(tmp_path / "w.npz")
    save_params_npz(params, p)
    back = load_params_npz(p)
    np.testing.assert_array_equal(back["A"]["b"], params["A"]["b"])
    np.testing.assert_array_equal(back["A"]["c"]["d"], params["A"]["c"]["d"])


def test_fid_real_indices_unique_exact_and_sharded():
    from lcgan_tpu.eval.fid import fid_real_indices

    # single process: exact count, no duplicates, within range, shuffled
    idx = fid_real_indices(100, num_batches=6, local_b=4, seed=7)
    assert len(idx) == 24
    assert len(np.unique(idx)) == 24
    assert idx.min() >= 0 and idx.max() < 100
    assert not np.array_equal(idx, np.arange(24))  # seeded permutation, not file order

    # two processes: disjoint shards, together exactly num*local*pc unique
    a = fid_real_indices(100, 6, 4, seed=7, process_index=0, process_count=2)
    b = fid_real_indices(100, 6, 4, seed=7, process_index=1, process_count=2)
    both = np.concatenate([a, b])
    assert len(both) == 48 and len(np.unique(both)) == 48

    # refuses to sample with replacement
    with pytest.raises(ValueError, match="unique reals"):
        fid_real_indices(10, num_batches=3, local_b=4, seed=0)
