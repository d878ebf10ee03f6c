"""Training-dynamics validation: run thousands of REAL train iterations.

The reference's entire validation story is loss curves + visual monitors over
long runs (loader.py:44-82, worker.py:255-363); unit tests can't see slow
dynamics risks (QR sign-fix effects on the mapping, bf16 drift in the warp,
EMA/w-avg interaction). This probe trains the real model on synthetic
structured data for a few thousand iterations on whatever backend is visible
(the real TPU under the driver) and records:

  * g_loss / d_loss curves (and the R1-iteration d_loss separately)
  * R1 penalty magnitude proxy (d_loss delta on r1 iters)
  * mapping diagonal L1 (the sparsity target) trajectory
  * w-avg norms and EMA-vs-live parameter distance
  * a PASS/FAIL summary: everything finite, both losses move, adversarial
    losses stay in a sane band, EMA tracks the live params

Synthetic data: procedural scenes (gradient background + ellipse + bar) with
the reference's triple-view contract (custom_dataset.py:59-88): the geometry
view is a spatial warp of the SAME image, the appearance view is a color
jitter of the SAME image.

Usage:  python -m tools.dynamics_probe [--res 64] [--steps 3000] [--batch 32]
Writes <out>/curves.jsonl + summary line; exit 1 on FAIL.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np


def make_scene(rng: np.random.Generator, res: int) -> np.ndarray:
    """One structured image in [-1, 1], HWC fp32."""
    c0 = rng.uniform(-1, 1, 3)
    c1 = rng.uniform(-1, 1, 3)
    t = np.linspace(0, 1, res)[:, None, None]
    img = c0 * (1 - t) + c1 * t
    img = np.broadcast_to(img, (res, res, 3)).copy()

    # ellipse
    cy, cx = rng.uniform(0.25, 0.75, 2) * res
    ay, ax = rng.uniform(0.08, 0.3, 2) * res
    col = rng.uniform(-1, 1, 3)
    yy, xx = np.mgrid[0:res, 0:res]
    mask = ((yy - cy) / ay) ** 2 + ((xx - cx) / ax) ** 2 < 1.0
    img[mask] = col

    # bar
    x0 = int(rng.uniform(0.1, 0.7) * res)
    wd = max(1, int(rng.uniform(0.05, 0.2) * res))
    img[:, x0 : x0 + wd] = rng.uniform(-1, 1, 3)
    return np.clip(img, -1, 1).astype(np.float32)


def geometry_view(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Spatial warp of the same image (the Perspective-augment analog)."""
    from scipy import ndimage

    res = img.shape[0]
    ang = rng.uniform(-0.3, 0.3)
    scale = rng.uniform(0.85, 1.15)
    shift = rng.uniform(-0.1, 0.1, 2) * res
    c, s = math.cos(ang) / scale, math.sin(ang) / scale
    mat = np.array([[c, -s], [s, c]])
    center = res / 2
    off = center - mat @ (center + shift)
    out = np.stack(
        [
            ndimage.affine_transform(img[..., k], mat, offset=off, order=1, mode="constant")
            for k in range(3)
        ],
        axis=-1,
    )
    return out.astype(np.float32)


def appearance_view(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Color jitter of the same image (brightness/contrast/channel gain)."""
    gain = rng.uniform(0.7, 1.3, 3)
    off = rng.uniform(-0.2, 0.2, 3)
    return np.clip(img * gain + off, -1, 1).astype(np.float32)


def build_pool(res: int, n: int, seed: int):
    rng = np.random.default_rng(seed)
    base = np.stack([make_scene(rng, res) for _ in range(n)])
    geo = np.stack([geometry_view(b, rng) for b in base])
    app = np.stack([appearance_view(b, rng) for b in base])
    return base, geo, app


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--pool", type=int, default=512)
    ap.add_argument("--record_every", type=int, default=20)
    ap.add_argument("--out", type=str, default="/tmp/lcgan_dynamics")
    ap.add_argument("--compute_dtype", type=str, default="bfloat16")
    ap.add_argument(
        "--flow_every",
        type=int,
        default=0,
        help="record per-block max|flow| + implied dyn-band M-hat vs the "
        "static bound every N steps (0 = off) — the flow-displacement "
        "trajectory the in-kernel dynamic band's economics rest on",
    )
    ap.add_argument(
        "--monitor_at",
        type=int,
        default=0,
        help="render one monitor sweep artifact at this step (0 = off): "
        "proves the EMA generator mid-run, like the reference's "
        "show_interval monitors (loader.py:70-73)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/lcgan_jax")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass

    from lcgan_tpu.config import Config
    from lcgan_tpu.train.steps import Trainer

    os.makedirs(args.out, exist_ok=True)
    cfg = Config(
        model_name=args.out,
        img_resolution=args.res,
        batch_size=args.batch,
        compute_dtype=args.compute_dtype,
        remat_blocks=True,
        freezeD_start=10**9,
        g_lr=0.002,
        d_lr=0.002,
    )
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()

    print(f"building {args.pool}-scene pool at {args.res}² ...", flush=True)
    base, geo, app = build_pool(args.res, args.pool, seed=0)
    rng = np.random.default_rng(1)

    def l1_diag(params):
        return float(
            jnp.sum(jnp.abs(params["geometry_mapping"]["diagonal_params"]))
            + jnp.sum(jnp.abs(params["appearance_mapping"]["diagonal_params"]))
        )

    def ema_dist(state):
        """EMA-vs-live distance RELATIVE to the live param norm — both are
        L2 over every G param, so only the ratio is scale-free (decay 0.9999
        over a few thousand steps legitimately trails by ~10-15%)."""
        sq = jax.tree.map(
            lambda a, b: jnp.sum((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2),
            state.g_params,
            state.ema_params,
        )
        nrm = jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32) ** 2), state.g_params)
        dist = float(jnp.sqrt(jax.tree.reduce(lambda a, b: a + b, sq)))
        return dist / max(float(jnp.sqrt(jax.tree.reduce(lambda a, b: a + b, nrm))), 1e-9)

    # per-block flow-displacement capture (same technique as
    # tools/flow_window_probe.py, but along the TRAINING trajectory): tanh'd
    # smoothed flows from the EMA generator, reported as max|flow| and the
    # implied adaptive-band displacement M-hat vs the static worst-case M.
    flow_capture = None
    if args.flow_every > 0:
        from lcgan_tpu.ops.filters import box_filter_3x3
        from lcgan_tpu.ops.grid_sample import max_warp_displacement

        gen = trainer.generator
        flow_sizes = {}  # filled at trace time from the real block shapes

        @jax.jit
        def _capture(params, stats, z1, z2):
            _, inter = gen.apply(
                {"params": params, "stats": stats},
                z1,
                z2,
                1.0,
                mutable=["intermediates"],
                capture_intermediates=lambda mdl, name: mdl.name == "flow_layer",
            )
            out = {}
            for bi in range(cfg.num_blocks):
                raw = jax.tree.leaves(inter["intermediates"][f"block_{bi}"]["flow_layer"])[0]
                flow_sizes[bi] = raw.shape[1]
                out[bi] = jnp.max(jnp.abs(jnp.tanh(box_filter_3x3(raw.astype(jnp.float32)))))
            return out

        zf1 = jnp.asarray(np.random.default_rng(7).standard_normal((8, cfg.geo_noise_dim)), jnp.float32)
        zf2 = jnp.asarray(np.random.default_rng(8).standard_normal((8, cfg.app_noise_dim)), jnp.float32)

        def flow_capture(state):
            amax = {k: float(v) for k, v in _capture(state.ema_params, state.ema_stats, zf1, zf2).items()}
            rec = {}
            for bi, a in amax.items():
                size = flow_sizes[bi]
                m_static = max_warp_displacement(size, cfg.max_flow_scale)
                m_hat = int(math.ceil(0.5 + cfg.max_flow_scale * size / 2 * a + 2.0))
                rec[str(bi)] = {"size": size, "amax": round(a, 4), "m_hat": m_hat, "m_static": m_static}
            return rec

    curves = []
    t0 = time.time()
    path = os.path.join(args.out, "curves.jsonl")
    with open(path, "w") as f:
        for step in range(args.steps):
            idx = rng.integers(0, args.pool, args.batch)
            batch = {
                "image": jnp.asarray(base[idx]),
                "geometry_change": jnp.asarray(geo[idx]),
                "appearance_change": jnp.asarray(app[idx]),
            }
            state, g_loss, d_loss = trainer.train_iteration(state, batch, step)
            if args.monitor_at and step == args.monitor_at:
                try:
                    from lcgan_tpu.gen.artifacts import monitor_current_result

                    cfg.make_run_dirs()
                    monitor_current_result(
                        cfg, trainer, state, epoch=step, num_explore=4, num_clips=1,
                        images_per_output=min(cfg.geo_noise_dim, 16), nrow=4,
                    )
                    print(f"monitor artifact written at step {step}", flush=True)
                except Exception as e:  # keep the run alive; artifact is a rider
                    print(f"monitor artifact FAILED: {type(e).__name__}: {e}", flush=True)
            # the off-by-one records land on odd steps, half of them R1
            # iterations (step % 8 == 1) — without them no R1-iter d_loss
            # would ever be sampled at even record_every
            if step % args.record_every in (0, 1) or step == args.steps - 1:
                rec = {
                    "step": step,
                    "g_loss": float(g_loss),
                    "d_loss": float(d_loss),
                    "r1_iter": step % 8 == 1,
                    "diag_l1": l1_diag(state.g_params),
                    "w_avg1": float(jnp.linalg.norm(state.g_stats["avg_latent1"])),
                    "w_avg2": float(jnp.linalg.norm(state.g_stats["avg_latent2"])),
                    "ema_dist": ema_dist(state),
                    "elapsed": round(time.time() - t0, 1),
                }
                # flow_every should be a multiple of record_every so these
                # land on record steps; the final record always carries one
                if flow_capture is not None and (
                    step % args.flow_every == 0 or step == args.steps - 1
                ):
                    rec["flow"] = flow_capture(state)
                curves.append(rec)
                f.write(json.dumps(rec) + "\n")
                f.flush()
                if step % (args.record_every * 10) == 0:
                    print(rec, flush=True)

    # ---- pass/fail summary ----
    g = np.array([c["g_loss"] for c in curves])
    d = np.array([c["d_loss"] for c in curves])
    half = len(curves) // 2
    checks = {
        "finite": bool(np.isfinite(g).all() and np.isfinite(d).all()),
        "g_moves": bool(np.std(g[half:]) > 1e-4 or abs(g[half:].mean() - g[:half].mean()) > 1e-3),
        "d_moves": bool(np.std(d[half:]) > 1e-4 or abs(d[half:].mean() - d[:half].mean()) > 1e-3),
        # BCE-with-logits adversarial losses live in a sane band when neither
        # player collapses (all-real-confident D drives g_loss to +inf)
        "g_band": bool(0.01 < np.median(g[half:]) < 20.0),
        "d_band": bool(0.01 < np.median(d[half:]) < 20.0),
        "w_avg_nonzero": bool(curves[-1]["w_avg1"] > 0 and curves[-1]["w_avg2"] > 0),
        "ema_tracks": bool(0 < curves[-1]["ema_dist"] < 0.5),
        "diag_l1_finite": bool(np.isfinite(curves[-1]["diag_l1"])),
    }
    ok = all(checks.values())
    summary = {
        "result": "PASS" if ok else "FAIL",
        "steps": args.steps,
        "res": args.res,
        "final_g": round(float(g[-1]), 4),
        "final_d": round(float(d[-1]), 4),
        "median_g_late": round(float(np.median(g[half:])), 4),
        "median_d_late": round(float(np.median(d[half:])), 4),
        "diag_l1_first": round(curves[0]["diag_l1"], 4),
        "diag_l1_last": round(curves[-1]["diag_l1"], 4),
        "ema_dist_last": round(curves[-1]["ema_dist"], 4),
        "imgs_per_sec": round(args.batch * args.steps / (time.time() - t0), 2),
        "checks": checks,
    }
    print(json.dumps(summary), flush=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # snapshot the trained state — tools/flow_window_probe.py reuses it to
    # measure REAL (not init-time) flow magnitudes
    from lcgan_tpu.utils.checkpoint import CheckpointManager

    CheckpointManager(os.path.join(args.out, "model")).save(state)
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
