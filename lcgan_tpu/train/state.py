"""Train state pytree.

One pytree holds *everything* the run needs to resume bit-exact: both
parameter sets, the generator's w-avg stats, EMA params+stats, both Adam
states, the PRNG key, and the step counter. This is strictly more than the
reference checkpoints (worker.py:219-253 drops optimizer and RNG state —
SURVEY.md §3.5), and it makes Orbax save/restore a single operation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lcgan_tpu.config import Config
from lcgan_tpu.models import Discriminator, Generator


@struct.dataclass
class TrainState:
    step: jax.Array
    g_params: Any
    g_stats: Any
    d_params: Any
    ema_params: Any
    ema_stats: Any
    g_opt: Any
    d_opt: Any
    rng: jax.Array


def build_models(cfg: Config):
    generator = Generator(
        img_resolution=cfg.img_resolution,
        geo_noise_dim=cfg.geo_noise_dim,
        app_noise_dim=cfg.app_noise_dim,
        geo_latent_dim=cfg.geo_latent_dim,
        app_latent_dim=cfg.app_latent_dim,
        max_flow_scale=cfg.max_flow_scale,
        base_nf=cfg.base_nf,
        max_nf=cfg.max_nf,
        img_ch=cfg.img_ch,
        remat=cfg.remat_blocks,
        remat_save_g_convs=cfg.remat_save_g_convs,
        remat_save_max_res=cfg.remat_save_max_res,
        warp_impl=cfg.warp_impl,
        warp_pallas_min_res=cfg.warp_pallas_min_res,
        warp_adaptive_band=cfg.warp_adaptive_band,
        dtype=cfg.dtype,
    )
    discriminator = Discriminator(
        img_resolution=cfg.img_resolution,
        geo_projection_dim=cfg.geo_projection_dim,
        app_projection_dim=cfg.app_projection_dim,
        base_nf=cfg.base_nf,
        max_nf=cfg.max_nf,
        mbstd_group_size=cfg.mbstd_group_size,
        remat=cfg.remat_blocks,
        remat_save_d_convs=cfg.remat_save_d_convs,
        remat_save_max_res=cfg.remat_save_max_res,
        dtype=cfg.dtype,
    )
    return generator, discriminator


def _adam_no_mu(learning_rate: float, b2: float, eps: float):
    """Adam with beta1 == 0: the first moment IS the gradient (m = (1-0)·g,
    bias correction 1/(1-0^t) = 1), so storing mu wastes a full param-sized
    buffer. Identical update to optax.adam(b1=0): g / (sqrt(v̂) + eps)."""

    def init(params):
        return {
            "v": jax.tree.map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        del params
        count = state["count"] + 1
        v = jax.tree.map(
            lambda vv, g: b2 * vv + (1.0 - b2) * jnp.square(g), state["v"], grads
        )
        correction = 1.0 - b2 ** count.astype(jnp.float32)
        updates = jax.tree.map(
            lambda g, vv: -learning_rate * g / (jnp.sqrt(vv / correction) + eps), grads, v
        )
        return updates, {"v": v, "count": count}

    return optax.GradientTransformation(init, update)


def make_optimizers(cfg: Config):
    # Adam (beta1=0.0, beta2=0.99, eps=1e-8), worker.py:98-110
    if cfg.beta1 == 0.0:
        g_tx = _adam_no_mu(cfg.g_lr, cfg.beta2, cfg.adam_eps)
        d_tx = _adam_no_mu(cfg.d_lr, cfg.beta2, cfg.adam_eps)
    else:
        g_tx = optax.adam(cfg.g_lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.adam_eps)
        d_tx = optax.adam(cfg.d_lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.adam_eps)
    return g_tx, d_tx


def create_train_state(
    cfg: Config, seed: int | None = None, models=None, txs=None
) -> TrainState:
    """Initialize all params/opt-states; EMA starts as an exact copy
    (ema.py:12-17). ``models``/``txs`` let a Trainer pass its own
    (build_models is deterministic in cfg either way — this just avoids a
    second construction)."""
    generator, discriminator = models if models is not None else build_models(cfg)
    g_tx, d_tx = txs if txs is not None else make_optimizers(cfg)

    key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
    kg, kd, krun = jax.random.split(key, 3)
    # mbstd divides the per-device batch into groups; 2 samples suffice for init
    z1 = jnp.zeros((2, cfg.geo_noise_dim))
    z2 = jnp.zeros((2, cfg.app_noise_dim))
    g_vars = generator.init(kg, z1, z2, -1.0)
    img = jnp.zeros((2, cfg.img_resolution, cfg.img_resolution, cfg.img_ch))
    d_vars = discriminator.init(kd, img, True)

    g_params = g_vars["params"]
    g_stats = g_vars["stats"]
    d_params = d_vars["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_stats=g_stats,
        d_params=d_params,
        ema_params=jax.tree.map(jnp.copy, g_params),
        ema_stats=jax.tree.map(jnp.copy, g_stats),
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        rng=krun,
    )
