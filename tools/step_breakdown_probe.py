"""Decompose the train step: G fwd / G bwd / D fwd / D bwd / R1 at one res.

Times jitted sub-graphs in isolation (pipelined, axon-safe value barrier)
so the step's cost can be attributed before optimizing. Usage:
    python -m tools.step_breakdown_probe [--res 256] [--batch 8]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from lcgan_tpu.config import Config
from lcgan_tpu.train.state import build_models, create_train_state


def timeit(fn, *args, n=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--warp_impl", type=str, default="auto")
    ap.add_argument("--min_res", type=int, default=128, help="warp_pallas_min_res")
    ap.add_argument("--adaptive", default=True, action=argparse.BooleanOptionalAction,
                    help="flow-adaptive warp band")
    ap.add_argument("--phases", default=False, action=argparse.BooleanOptionalAction,
                    help="phase-decomposed k=3 up-convs (production default off; "
                         "off = lhs-dilated form)")
    ap.add_argument("--packconv", default=True, action=argparse.BooleanOptionalAction,
                    help="width-packed k=3 conv at tiny channel counts")
    ap.add_argument("--pack_max_co", type=int, default=None,
                    help="override PACKED_K3_MAX_CO (e.g. 64 to pack the c64 trunk convs)")
    ap.add_argument("--pack_lanes", type=int, default=None,
                    help="override PACKED_K3_LANE_TARGET (128 = the r2 p=128//Co rule)")
    ap.add_argument("--savewarp", default=False, action=argparse.BooleanOptionalAction,
                    help="remat policy saves each G block's modulated-conv outputs")
    ap.add_argument("--savedconv", default=False, action=argparse.BooleanOptionalAction,
                    help="remat policy saves each D block's trunk conv outputs")
    ap.add_argument("--save_max_res", type=int, default=512,
                    help="remat_save_max_res gate for the save policies")
    args = ap.parse_args()

    # assign BOTH ways: the module defaults have flipped before (UP2_PHASES
    # is now default-off), and a disable-only pattern silently turns the
    # "on" A/B arm into a copy of the "off" arm
    from lcgan_tpu.ops import equalized, modulated

    modulated.UP2_PHASES = args.phases
    equalized.PACKED_K3 = args.packconv
    if args.pack_max_co is not None:
        equalized.PACKED_K3_MAX_CO = args.pack_max_co
    if args.pack_lanes is not None:
        equalized.PACKED_K3_LANE_TARGET = args.pack_lanes

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass

    cfg = Config(
        model_name="/tmp/lcgan_perf",
        img_resolution=args.res,
        batch_size=args.batch,
        compute_dtype="bfloat16",
        remat_blocks=True,
        remat_save_g_convs=args.savewarp,
        remat_save_d_convs=args.savedconv,
        remat_save_max_res=args.save_max_res,
        warp_impl=args.warp_impl,
        warp_pallas_min_res=args.min_res,
        warp_adaptive_band=args.adaptive,
    )
    G, D = build_models(cfg)
    state = create_train_state(cfg)
    rng = np.random.default_rng(0)
    b = args.batch
    z1 = jnp.asarray(rng.standard_normal((b, cfg.geo_noise_dim)), jnp.float32)
    z2 = jnp.asarray(rng.standard_normal((b, cfg.app_noise_dim)), jnp.float32)
    img = jnp.asarray(rng.uniform(-1, 1, (b, args.res, args.res, 3)), jnp.float32)

    g_vars = {"params": state.g_params, "stats": state.g_stats}

    @jax.jit
    def g_fwd(v, z1, z2):
        out, _ = G.apply(v, z1, z2, -1.0, mutable=["stats"])
        return out

    @jax.jit
    def g_grad(v, z1, z2):
        def loss(p):
            out, _ = G.apply({"params": p, "stats": v["stats"]}, z1, z2, -1.0, mutable=["stats"])
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        return jax.grad(loss)(v["params"])

    @jax.jit
    def d_fwd(p, x):
        return D.apply({"params": p}, x, False)

    @jax.jit
    def d_grad(p, x):
        def loss(pp):
            logit, _, _ = D.apply({"params": pp}, x, False)
            return jnp.mean(jnp.square(logit.astype(jnp.float32)))

        return jax.grad(loss)(p)

    @jax.jit
    def r1_grad(p, x):
        from lcgan_tpu.losses import r1_penalty_with_logits

        def loss(pp):
            _, r1 = r1_penalty_with_logits(lambda im: D.apply({"params": pp}, im, False)[0], x)
            return jnp.mean(r1)

        return jax.grad(loss)(p)

    def flops_of(fn, *a):
        try:
            return float(jax.jit(fn).lower(*a).compile().cost_analysis().get("flops", 0.0))
        except Exception:
            return 0.0

    print(f"res={args.res} b={b} warp_impl={cfg.warp_impl}", flush=True)
    rows = [
        ("G fwd   ", g_fwd, (g_vars, z1, z2), 10),
        ("G grad  ", g_grad, (g_vars, z1, z2), 6),
        ("D fwd   ", d_fwd, (state.d_params, img), 10),
        ("D grad  ", d_grad, (state.d_params, img), 6),
        ("R1 grad ", r1_grad, (state.d_params, img), 6),
    ]
    for name, fn, a, n in rows:
        ms = timeit(fn, *a, n=n)
        gf = flops_of(fn, *a) / 1e9  # XLA-counted; Pallas kernels count as 0
        tps = gf / ms if ms > 0 else 0.0  # achieved TFLOP/s (XLA portion)
        print(f"{name}: {ms:8.1f} ms | {gf:8.1f} GF | {tps:5.2f} TF/s", flush=True)


if __name__ == "__main__":
    main()
