"""Train-step tests: schedule variants, EMA, freezeD, DP equivalence."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcgan_tpu.config import Config
from lcgan_tpu.parallel import make_mesh
from lcgan_tpu.train.ema import ema_update
from lcgan_tpu.train.freeze import apply_mask, freeze_mask
from lcgan_tpu.train.state import create_train_state
from lcgan_tpu.train.steps import Trainer


def tiny_cfg(**kw):
    base = dict(
        model_name="/tmp/lcgan_test_run",
        img_resolution=16,
        batch_size=4,
        geo_noise_dim=8,
        app_noise_dim=8,
        geo_latent_dim=8,
        app_latent_dim=16,
        geo_projection_dim=8,
        app_projection_dim=8,
        base_nf=8,
        max_nf=16,
        mbstd_group_size=2,
        compute_dtype="float32",
        freezeD_start=100000,
    )
    base.update(kw)
    return Config(**base)


def fake_batch(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.uniform(-1, 1, (b, cfg.img_resolution, cfg.img_resolution, 3)).astype(np.float32)
    )
    return {"image": mk(), "geometry_change": mk(), "appearance_change": mk()}


def test_adam_no_mu_matches_optax_adam():
    """The mu-free Adam (beta1=0) must match optax.adam(b1=0) exactly."""
    import optax

    from lcgan_tpu.train.state import _adam_no_mu

    params = {"w": jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)), jnp.float32)}
    ours = _adam_no_mu(0.002, 0.99, 1e-8)
    ref = optax.adam(0.002, b1=0.0, b2=0.99, eps=1e-8)
    s1, s2 = ours.init(params), ref.init(params)
    p1 = p2 = params
    for step in range(5):
        g = {"w": jnp.asarray(np.random.default_rng(step + 1).standard_normal((4, 3)), jnp.float32)}
        u1, s1 = ours.update(g, s1, p1)
        u2, s2 = ref.update(g, s2, p2)
        p1 = optax.apply_updates(p1, u1)
        p2 = optax.apply_updates(p2, u2)
        np.testing.assert_allclose(np.asarray(p1["w"]), np.asarray(p2["w"]), rtol=1e-6, atol=1e-7)


def test_ema_update_semantics():
    p = {"w": jnp.ones((3,)) * 2.0}
    e = {"w": jnp.zeros((3,))}
    # decay 0.9: new = (1-d)*p + d*ema = 0.2
    new_p, _ = ema_update(p, {}, e, {}, jnp.asarray(10), 0.9, 0)
    np.testing.assert_allclose(np.asarray(new_p["w"]), 0.2, rtol=1e-6)
    # before start_iter: copy
    new_p, _ = ema_update(p, {}, e, {}, jnp.asarray(3), 0.9, 5)
    np.testing.assert_allclose(np.asarray(new_p["w"]), 2.0, rtol=1e-6)


def test_freeze_mask_covers_from_rgb_and_blocks():
    cfg = tiny_cfg()
    state = create_train_state(cfg)
    mask = freeze_mask(state.d_params, 1)
    assert all(jax.tree.leaves(mask["from_rgb"]))
    assert all(jax.tree.leaves(mask["block_0"]))
    assert not any(jax.tree.leaves(mask["block_1"]))
    assert not any(jax.tree.leaves(mask["discriminator_epilogue"]))
    zeroed = apply_mask(state.d_params, mask)
    assert float(jnp.sum(jnp.abs(zeroed["from_rgb"]["weight"]))) == 0.0
    assert float(jnp.sum(jnp.abs(zeroed["block_1"]["conv0"]["weight"]))) > 0


@pytest.mark.parametrize("epoch", [0, 1, 2])  # even+aux, odd+r1, even
def test_single_device_train_iteration(epoch):
    cfg = tiny_cfg()
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    batch = fake_batch(cfg, cfg.batch_size)
    # snapshot before the call: the step donates the input state's buffers
    g_before = jax.tree.map(lambda x: np.array(x), state.g_params)
    new_state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    assert int(new_state.step) == 1
    # params actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(
            lambda a, b: float(jnp.sum(jnp.abs(np.asarray(a) - b))), new_state.g_params, g_before
        ),
    )
    assert delta > 0


def test_freezed_variant_keeps_frozen_params():
    cfg = tiny_cfg(freezeD_start=0, freezeD_layer=1)
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    batch = fake_batch(cfg, cfg.batch_size)
    d_before = jax.tree.map(lambda x: np.array(x), state.d_params)
    new_state, _, _ = trainer.train_iteration(state, batch, 1)
    # frozen: from_rgb and block_0 unchanged; block_1 moved
    same = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(np.asarray(a) - b))),
        new_state.d_params["from_rgb"],
        d_before["from_rgb"],
    )
    assert max(jax.tree.leaves(same)) == 0.0
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(np.asarray(a) - b))),
        new_state.d_params["block_1"],
        d_before["block_1"],
    )
    assert max(jax.tree.leaves(moved)) > 0.0


@pytest.mark.parametrize("epoch", [1, 2, 9])  # odd+r1, even+aux, odd+r1 again
def test_freezed_stop_gradient_matches_mask_oracle(epoch):
    """The stop_gradient freezeD form (skips frozen backward) must produce
    states identical to the pure grad-mask oracle — including under R1,
    whose ∇_image must keep flowing through the frozen trunk."""
    cfg = tiny_cfg(freezeD_start=0, freezeD_layer=1)
    states, losses = [], []
    for use_sg in (True, False):
        trainer = Trainer(cfg, mesh=None)
        trainer._freeze_stop_gradient = use_sg
        state = trainer.init_state()
        batch = fake_batch(cfg, cfg.batch_size)
        state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)
        states.append(jax.tree.map(np.asarray, state.d_params))
        losses.append((float(g_loss), float(d_loss)))
    # the two freezeD forms compile to different XLA programs, so allow
    # fp32 reassociation noise — a semantic difference (e.g. a broken R1
    # image-grad path) is orders of magnitude larger
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6),
        states[0],
        states[1],
    )


def test_w_avg_updates_during_training():
    cfg = tiny_cfg()
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    batch = fake_batch(cfg, cfg.batch_size)
    new_state, _, _ = trainer.train_iteration(state, batch, 0)
    assert float(jnp.sum(jnp.abs(new_state.g_stats["avg_latent1"]))) > 0
    # EMA stats track the (lerped) stats
    assert new_state.ema_stats["avg_latent1"].shape == (cfg.geo_latent_dim,)


def test_data_parallel_iteration_runs_on_fake_mesh():
    """8 fake CPU devices: shard_map DP step executes and syncs (SURVEY.md §4)."""
    cfg = tiny_cfg(batch_size=8, mbstd_group_size=1)
    mesh = make_mesh()
    assert mesh.size == 8
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()
    batch = fake_batch(cfg, cfg.batch_size)
    new_state, g_loss, d_loss = trainer.train_iteration(state, batch, 0)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    # all-device params remain replicated after the step
    leaf = new_state.g_params["const"]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_generate_sharded_matches_plain_on_mesh():
    """DP generation over the 8-fake-device mesh == the plain jit path,
    including the pad-to-device-count crop (batch 6 on 8 devices)."""
    cfg = tiny_cfg(batch_size=8, mbstd_group_size=1)
    mesh = make_mesh()
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()
    rng = np.random.default_rng(3)
    z1 = rng.standard_normal((6, cfg.geo_noise_dim)).astype(np.float32)
    z2 = rng.standard_normal((6, cfg.app_noise_dim)).astype(np.float32)
    sharded = trainer.generate_sharded(state, z1, z2, w_psi=1.0)
    plain = np.asarray(trainer.generate(state, jnp.asarray(z1), jnp.asarray(z2), 1.0))
    assert sharded.shape == plain.shape
    np.testing.assert_allclose(
        np.float32(sharded), np.float32(plain), atol=2e-5, rtol=1e-4
    )


def test_generate_uses_ema_and_truncation():
    cfg = tiny_cfg()
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    z1 = jax.random.normal(jax.random.PRNGKey(0), (2, cfg.geo_noise_dim))
    z2 = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.app_noise_dim))
    img = trainer.generate(state, z1, z2, w_psi=1.0)
    assert img.shape == (2, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_generate_untruncated_w_psi():
    """w_psi <= 0 (the reference's untruncated sampling mode) must generate,
    not raise on the in-forward w-avg mutation (ADVICE r1)."""
    cfg = tiny_cfg()
    trainer = Trainer(cfg)
    state = trainer.init_state()
    z1 = jnp.zeros((2, cfg.geo_noise_dim))
    z2 = jnp.zeros((2, cfg.app_noise_dim))
    out = trainer.generate(state, z1, z2, w_psi=-1.0)
    assert out.shape == (2, cfg.img_resolution, cfg.img_resolution, 3)
    assert bool(jnp.isfinite(out).all())
    # and the mutation is discarded: state is untouched
    np.testing.assert_array_equal(
        np.asarray(state.ema_stats["avg_latent1"]), np.zeros(cfg.geo_latent_dim)
    )


def test_restore_without_epoch_file(tmp_path):
    """A checkpoint without epoch.txt (e.g. a transplanted state_best) must
    still restore weights for eval phases (ADVICE r1)."""
    from lcgan_tpu.train.loop import load_or_init_state
    from lcgan_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_cfg(model_name=str(tmp_path / "run"))
    cfg.make_run_dirs()
    trainer = Trainer(cfg)
    state = trainer.init_state()
    state = state.replace(step=jnp.asarray(77, jnp.int32))
    CheckpointManager(cfg.run_dirs()["model"]).save(state)
    assert not os.path.exists(os.path.join(cfg.model_name, "epoch.txt"))

    restored, start_epoch, _ = load_or_init_state(cfg, trainer)
    assert int(restored.step) == 77  # weights restored
    assert start_epoch == 0  # epoch.txt only gates the resume epoch


@pytest.mark.parametrize("epoch", [0, 1])
def test_data_parallel_step_equals_meshless_reference(epoch):
    """SURVEY §4 DP-equivalence: one shard_map step over the 8-device mesh
    must equal the SAME per-shard computation run without any mesh (vmap with
    a named axis has identical pmean/axis_index semantics) — this pins the
    mesh wiring (batch sharding, grad/loss pmean, w-avg pmean, replication),
    not just finiteness."""
    import functools

    # adam_eps=1e-3: with beta1=0 the first-step Adam update is lr·g/(|g|+eps)
    # — at the default eps a noise-level gradient element flips sign and moves
    # the param by a full ±lr, which would test fp32 summation-order noise, not
    # the mesh wiring. The damped eps keeps updates proportional to gradients.
    # img_resolution=8 (1 block): mesh wiring is depth-independent, and the
    # oracle+step compiles dominate the fast lane at 2 blocks.
    cfg = tiny_cfg(batch_size=16, adam_eps=1e-3, img_resolution=8)
    mesh = make_mesh(num_devices=8)
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()
    batch = fake_batch(cfg, 16, seed=3)

    even = epoch % 2 == 0

    # meshless oracle: vmap the per-device iteration body over 8 shards
    ref_fn = jax.vmap(
        functools.partial(trainer._iteration, even=even, with_r1=epoch % 8 == 1, frozen=False),
        axis_name="data",
        in_axes=(None, 0),
    )
    shards = jax.tree.map(lambda x: x.reshape(8, 2, *x.shape[1:]), batch)
    ref_state, ref_g, ref_d = jax.jit(ref_fn)(state, shards)
    # pmean makes every shard's outputs identical — collapse the vmap axis
    ref_state = jax.tree.map(lambda x: x[0], ref_state)
    jax.block_until_ready(ref_state)

    new_state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)

    np.testing.assert_allclose(float(g_loss), float(ref_g[0]), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(d_loss), float(ref_d[0]), atol=1e-5, rtol=1e-5)
    for path, a in jax.tree_util.tree_flatten_with_path(new_state.g_params)[0]:
        b = functools.reduce(lambda t, k: t[k.key], path, ref_state.g_params)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=f"g_params mismatch at {jax.tree_util.keystr(path)}",
        )
    for path, a in jax.tree_util.tree_flatten_with_path(new_state.d_params)[0]:
        b = functools.reduce(lambda t, k: t[k.key], path, ref_state.d_params)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4,
            err_msg=f"d_params mismatch at {jax.tree_util.keystr(path)}",
        )
    np.testing.assert_allclose(
        np.asarray(new_state.g_stats["avg_latent1"]),
        np.asarray(ref_state.g_stats["avg_latent1"]), atol=1e-6,
    )


def test_train_iteration_accepts_numpy_host_batch():
    """The pipeline hands numpy host arrays; the mesh path must assemble them
    into a global sharded array (make_array_from_process_local_data)."""
    # same cfg/epoch as test_data_parallel_step_equals_meshless_reference[1]
    # so the step's HLO is a persistent-cache hit, not a fresh compile
    cfg = tiny_cfg(batch_size=16, adam_eps=1e-3, img_resolution=8)
    trainer = Trainer(cfg, mesh=make_mesh(num_devices=8))
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    mk = lambda: rng.uniform(-1, 1, (16, cfg.img_resolution, cfg.img_resolution, 3)).astype(np.float32)
    batch = {"image": mk(), "geometry_change": mk(), "appearance_change": mk()}
    new_state, g_loss, d_loss = trainer.train_iteration(state, batch, 1)
    assert np.isfinite(float(g_loss)) and np.isfinite(float(d_loss))
    assert len(new_state.g_params["const"].sharding.device_set) == 8


# even+aux fast; odd+r1 / odd plain are slow-lane (default-off feature,
# two full trainer compiles per case dominate the fast lane's budget)
@pytest.mark.parametrize(
    "epoch",
    [0, pytest.param(1, marks=pytest.mark.slow), pytest.param(3, marks=pytest.mark.slow)],
)
def test_view_batched_step_matches_unbatched(epoch):
    """view_batched_steps fuses the per-view G/D applications into single
    larger-batch calls (steps.py); per-view mbstd and sequential w-avg lerps
    make it numerically equivalent to the reference's separate calls."""
    states, stats = [], []
    for flag in (False, True):
        # 1 block: the batched-view rewrite is per-call, not per-depth
        cfg = tiny_cfg(adam_eps=1e-3, view_batched_steps=flag, img_resolution=8)
        trainer = Trainer(cfg, mesh=None)
        state = trainer.init_state()
        batch = fake_batch(cfg, cfg.batch_size)
        new_state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)
        states.append((new_state, float(g_loss), float(d_loss)))
        stats.append(jax.tree.map(np.asarray, new_state.g_stats))
    (s0, g0, d0), (s1, g1, d1) = states
    np.testing.assert_allclose(g0, g1, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(d0, d1, rtol=2e-5, atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        s0.g_params,
        s1.g_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        s0.d_params,
        s1.d_params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6), stats[0], stats[1]
    )


@pytest.mark.slow
def test_resume_is_bit_exact(tmp_path):
    """Train N → save → restore in a FRESH PROCESS → train M more must be
    BITWISE identical to an uninterrupted N+M run: params, EMA, both Adam
    states (incl. count), w-avg stats, and the PRNG key all round-trip
    through Orbax. This is the claim that beats the reference's lossy
    resume (worker.py:239-253 drops optimizer + RNG state).

    Epochs 0..7 cover the full schedule period: 4 even+aux, 3 odd, 1 R1.
    """
    import subprocess
    import sys

    from lcgan_tpu.utils.checkpoint import CheckpointManager

    N, M = 4, 4
    cfg = tiny_cfg(model_name=str(tmp_path / "run"))
    cfg.make_run_dirs()
    trainer = Trainer(cfg)

    # uninterrupted N+M oracle
    oracle = trainer.init_state()
    for epoch in range(N + M):
        oracle, _, _ = trainer.train_iteration(oracle, fake_batch(cfg, cfg.batch_size, seed=epoch), epoch)

    # interrupted: N epochs, save, resume in a fresh process
    state = trainer.init_state()
    for epoch in range(N):
        state, _, _ = trainer.train_iteration(state, fake_batch(cfg, cfg.batch_size, seed=epoch), epoch)
    model_dir = cfg.run_dirs()["model"]
    CheckpointManager(model_dir).save(state)

    worker = os.path.join(os.path.dirname(__file__), "resume_worker.py")
    proc = subprocess.run(
        [sys.executable, worker, cfg.model_name, str(N), str(N + M)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    resumed = CheckpointManager(os.path.join(cfg.model_name, "model_resumed")).restore(
        trainer.init_state()
    )

    mismatches = []

    def check(path, a, b):
        a, b = np.asarray(a), np.asarray(b)
        if a.tobytes() != b.tobytes():
            mismatches.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, oracle, resumed)
    assert not mismatches, f"resume not bit-exact in: {mismatches}"
