"""Shape/parity tests for Generator and Discriminator (SURVEY.md §2.3)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcgan_tpu.models import Discriminator, Generator


def tiny_generator(res=32, base_nf=16, max_nf=64):
    return Generator(
        img_resolution=res,
        geo_noise_dim=8,
        app_noise_dim=8,
        geo_latent_dim=8,
        app_latent_dim=16,
        base_nf=base_nf,
        max_nf=max_nf,
    )


def tiny_discriminator(res=32, base_nf=16, max_nf=64):
    return Discriminator(
        img_resolution=res,
        geo_projection_dim=12,
        app_projection_dim=12,
        base_nf=base_nf,
        max_nf=max_nf,
        mbstd_group_size=2,
    )


def test_generator_forward_shape_and_stats():
    g = tiny_generator()
    z1 = jnp.zeros((4, 8))
    z2 = jnp.zeros((4, 8))
    variables = g.init(jax.random.PRNGKey(0), z1, z2, -1.0)
    assert set(variables.keys()) == {"params", "stats"}
    assert variables["stats"]["avg_latent1"].shape == (8,)
    assert variables["stats"]["avg_latent2"].shape == (16,)

    out, mut = g.apply(variables, z1, z2, -1.0, mutable=["stats"])
    assert out.shape == (4, 32, 32, 3)
    # w_psi <= 0 in training mode updates the running averages (cnn.py:96-97)
    z1r = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    out, mut = g.apply(variables, z1r, z2, -1.0, mutable=["stats"])
    assert float(jnp.sum(jnp.abs(mut["stats"]["avg_latent1"]))) > 0


def test_generator_truncation_no_stat_update():
    g = tiny_generator()
    z1 = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, 8))
    variables = g.init(jax.random.PRNGKey(0), z1, z2, -1.0)
    # w_psi=1.0 lerp with avg=0: code unchanged -> same as truncation no-op
    out1 = g.apply(variables, z1, z2, 1.0)
    assert out1.shape == (2, 32, 32, 3)
    # w_psi=0.5 pulls codes toward the (zero) average -> different image
    out2 = g.apply(variables, z1, z2, 0.5)
    assert float(jnp.max(jnp.abs(out1 - out2))) > 1e-6


@pytest.mark.parametrize(
    "res,expect_base",
    [(256, 128), (512, 64), (1024, 32)],
)
def test_channel_schedule_parity(res, expect_base):
    """Block counts and channel widths at 256/512/1024 (cnn.py:11-17,50-54),
    checked via init param shapes only (no forward at high res on CPU)."""
    g = Generator(img_resolution=res)
    assert g.num_blocks == int(math.log2(res)) - 2
    assert g.resolved_base_nf == expect_base
    d = Discriminator(img_resolution=res)
    assert d.resolved_base_nf == expect_base

    # generator block i output channels: min(base_nf*2^(nb-i-1), 512)
    nb = g.num_blocks
    for i in range(nb):
        expected = min(expect_base * 2 ** (nb - i - 1), 512)
        # the final block at full res ends with base_nf channels
        if i == nb - 1:
            assert expected == expect_base


def test_generator_param_tree_structure():
    g = tiny_generator()
    v = g.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)), jnp.zeros((2, 8)), -1.0)
    p = v["params"]
    assert "geometry_mapping" in p and "appearance_mapping" in p
    assert p["const"].shape == (4, 4, 64)  # (4,4,max_nf)
    nb = g.num_blocks
    for i in range(nb):
        blk = p[f"block_{i}"]
        assert {"skip_layer", "flow_layer", "modulated_conv0", "modulated_conv1"} <= set(blk)
        # flow layer produces a 2-channel field (custom_layers.py:123)
        assert blk["flow_layer"]["modulated_conv"]["weight"].shape[-1] == 2
    assert "rgb_layer" in p


def test_discriminator_forward_and_heads():
    d = tiny_discriminator()
    img = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    v = d.init(jax.random.PRNGKey(1), img, True)
    logit, geo, app = d.apply(v, img, True)
    assert logit.shape == (4, 1)
    assert geo.shape == (4, 12) and app.shape == (4, 12)
    # embeddings are L2-normalized (cnn.py:40-41)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(geo), axis=1), 1.0, atol=1e-5)

    logit2, geo2, app2 = d.apply(v, img, False)
    assert geo2 is None and app2 is None
    np.testing.assert_allclose(np.asarray(logit), np.asarray(logit2), atol=1e-6)


def test_discriminator_block_channels():
    d = tiny_discriminator(res=64, base_nf=8, max_nf=16)
    img = jnp.zeros((2, 64, 64, 3))
    v = d.init(jax.random.PRNGKey(0), img, True)
    p = v["params"]
    # D channels per block i: min(base_nf*2^i) -> min(base_nf*2^(i+1)), capped
    assert p["from_rgb"]["weight"].shape == (1, 1, 3, 8)
    assert p["block_0"]["conv1"]["weight"].shape[-1] == 16
    assert p["block_1"]["conv1"]["weight"].shape[-1] == 16  # capped at max_nf
    # epilogue linear: in = C*4*4, out = C (custom_layers.py:226)
    assert p["discriminator_epilogue"]["linear"]["weight"].shape == (16 * 16, 16)


def test_generator_bf16_compute_finite():
    g = Generator(
        img_resolution=16, geo_noise_dim=8, app_noise_dim=8, geo_latent_dim=8,
        app_latent_dim=16, base_nf=8, max_nf=16, dtype=jnp.bfloat16,
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    v = g.init(jax.random.PRNGKey(1), z, z, -1.0)
    out = g.apply(v, z, z, 1.0)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


def test_remat_save_g_convs_grads_match():
    """The save-warp-inputs remat policy changes only WHAT is saved vs
    recomputed in the backward — grads must match the default save-nothing
    remat to fp reassociation tolerance (models/generator.py "g_conv_out")."""
    z1 = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    grads = []
    # (save, max_res): off / on everywhere / on for only the first block
    # (16 < 32 exercises the mixed save/plain-remat path the 1024² recipe uses)
    for save, max_res in ((False, 512), (True, 512), (True, 16)):
        g = Generator(
            img_resolution=32, geo_noise_dim=8, app_noise_dim=8,
            geo_latent_dim=8, app_latent_dim=16, base_nf=16, max_nf=64,
            remat=True, remat_save_g_convs=save, remat_save_max_res=max_res,
        )
        v = g.init(jax.random.PRNGKey(2), z1, z2, -1.0)

        def loss(p):
            out, _ = g.apply({"params": p, "stats": v["stats"]}, z1, z2, -1.0, mutable=["stats"])
            return jnp.mean(jnp.square(out))

        grads.append(jax.jit(jax.grad(loss))(v["params"]))
    flat0 = jax.tree_util.tree_leaves(grads[0])
    for other in grads[1:]:
        for a, b in zip(flat0, jax.tree_util.tree_leaves(other)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_remat_save_d_convs_grads_match():
    """D-trunk analogue of the savewarp policy (models/discriminator.py
    "d_conv_out"): saving the block convs' outputs changes only what the
    remat backward recomputes — param AND input grads must match the
    save-nothing remat to fp reassociation tolerance."""
    img = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    grads = []
    # off / on everywhere / on below the top block only (mixed path)
    for save, max_res in ((False, 512), (True, 512), (True, 16)):
        d = Discriminator(
            img_resolution=32, base_nf=16, max_nf=64, mbstd_group_size=2,
            remat=True, remat_save_d_convs=save, remat_save_max_res=max_res,
        )
        v = d.init(jax.random.PRNGKey(1), img, True, 1)

        def loss(p, x):
            logit, ge, ae = d.apply({"params": p}, x, True, 1)
            return jnp.mean(jnp.square(logit)) + jnp.mean(ge * ae)

        grads.append(jax.jit(jax.grad(loss, argnums=(0, 1)))(v["params"], img))
    flat0 = jax.tree_util.tree_leaves(grads[0])
    for other in grads[1:]:
        for a, b in zip(flat0, jax.tree_util.tree_leaves(other)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
