"""Per-resolution performance probe on the real chip.

Times the full train iteration (even/odd/odd+R1 variants) and the inference
forward at 256/512/1024, with pipelined dispatch (the axon tunnel adds
~25-30ms per synchronous call, so everything is timed over async batches).

Usage: python tools/perf_probe.py [--res 256 512 1024] [--batch 16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.config import Config
from lcgan_tpu.train.steps import Trainer


def _materialize(out):
    # axon's block_until_ready can return early; a value read cannot lie
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def time_pipelined(fn, n=16):
    _materialize(fn())  # warm + true barrier
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    _materialize(out)
    return (time.perf_counter() - t0) / n


def probe(res: int, batch: int, view_batched: bool = True):
    cfg = Config(
        model_name="/tmp/lcgan_perf",
        img_resolution=res,
        batch_size=batch,
        compute_dtype="bfloat16",
        remat_blocks=True,
        freezeD_start=10**9,
        view_batched_steps=view_batched,
    )
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.uniform(-1, 1, (batch, res, res, 3)).astype(np.float32))
    batch_data = {"image": mk(), "geometry_change": mk(), "appearance_change": mk()}

    holder = {"state": state}

    def make_step(epoch):
        step = trainer.step_variant(epoch)

        def run():
            s, g, d = step(holder["state"], batch_data)
            holder["state"] = s
            return g

        return run

    results = {}
    for name, epoch in (("even", 0), ("odd", 2 * 10**6 + 3), ("odd_r1", 10**6 * 8 + 1)):
        dt = time_pipelined(make_step(epoch), n=12)
        results[name] = batch / dt

    z1 = jnp.zeros((batch, cfg.geo_noise_dim))
    z2 = jnp.zeros((batch, cfg.app_noise_dim))
    gen = lambda: trainer.generate(holder["state"], z1, z2, w_psi=1.0)
    results["infer"] = batch / time_pipelined(gen, n=12)

    # reference schedule mix per 8 iters: 4 even, 3 odd, 1 odd_r1
    mix = 8.0 / (4 / results["even"] + 3 / results["odd"] + 1 / results["odd_r1"])
    results["train_mix"] = mix
    return results


def main():
    import jax as _jax
    try:
        _jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--view_batched", default=True, action=argparse.BooleanOptionalAction)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    for res in args.res:
        batch = args.batch if res <= 256 else 8 if res == 512 else 4
        try:
            r = probe(res, batch, view_batched=args.view_batched)
            print(
                f"res={res:5d} batch={batch:3d} | "
                f"even {r['even']:8.1f} | odd {r['odd']:8.1f} | "
                f"r1 {r['odd_r1']:8.1f} | mix {r['train_mix']:8.1f} | "
                f"infer {r['infer']:8.1f}  imgs/sec/chip"
            )
        except Exception as e:  # OOM etc.
            print(f"res={res:5d} batch={batch:3d} | FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
