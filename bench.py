"""Training-throughput benchmark on the flagship config (FFHQ-256 recipe).

Measures steady-state imgs/sec for the full LC-GAN train iteration
(G step + EMA + D step) at 256², global batch 32, bf16 compute, on whatever
devices are visible (1 real TPU chip under the driver). The schedule mix is
the reference's: per 8 iterations — 4 even (contrastive aux), 3 odd, 1
odd+R1 (worker.py:151-210) — so the number is the real per-chip training
rate, not a cherry-picked variant.

Prints ONE JSON line. ``vs_baseline``: the reference publishes no throughput
(BASELINE.md — "published": {}), so the ratio is against 60 imgs/sec/chip,
an H100-class estimate for StyleGAN2-family training at 256² with R1 and the
reference's 5-forward/2-backward schedule (the BASELINE.json north star is
">= H100-class imgs/sec/chip").
"""

from __future__ import annotations

import json
import time

H100_CLASS_ESTIMATE_IMGS_PER_SEC = 60.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcgan_tpu.config import Config
    from lcgan_tpu.train.steps import Trainer

    n_chips = jax.device_count()
    # Per-chip batch 8 — the reference's per-GPU batch (global 32 over
    # 4 H100s, README.md:47-49). 16/chip is ~85M over a v5e's 16G HBM on
    # the even-iteration variant (3 G + 6 D applications live).
    cfg = Config(
        model_name="/tmp/lcgan_bench",
        img_resolution=256,
        batch_size=8 * n_chips,
        compute_dtype="bfloat16",
        remat_blocks=True,
        freezeD_start=10**9,
    )
    mesh = None
    if n_chips > 1:
        from lcgan_tpu.parallel import make_mesh

        mesh = make_mesh()
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.uniform(-1, 1, (cfg.batch_size, 256, 256, 3)).astype(np.float32)
    )
    batch = {"image": mk(), "geometry_change": mk(), "appearance_change": mk()}

    # warmup: compile all three schedule variants. NOTE: on the experimental
    # axon platform block_until_ready can return before execution finishes;
    # materializing a loss VALUE is the only reliable barrier.
    for epoch in range(0, 10):
        state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)
    float(g_loss)

    iters = 16
    t0 = time.perf_counter()
    for epoch in range(8, 8 + iters):
        state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)
    # the last loss transitively depends on every prior step's state
    float(g_loss), float(d_loss)
    dt = time.perf_counter() - t0

    imgs_per_sec = cfg.batch_size * iters / dt
    per_chip = imgs_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "train_imgs_per_sec_per_chip_256",
                "value": round(per_chip, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(per_chip / H100_CLASS_ESTIMATE_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
