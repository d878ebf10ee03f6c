"""Training-throughput benchmark at the reference's three flagship recipes.

Measures steady-state imgs/sec for the full LC-GAN train iteration
(G step + EMA + D step) at 256²/512²/1024² with the reference's per-GPU
batch sizes (global 32 over 4/4/8 H100s → 8/8/4 per chip, README.md:27-57),
bf16 compute, on whatever devices are visible (1 real TPU chip under the
driver). The schedule mix is the reference's: per 8 iterations — 4 even
(contrastive aux), 3 odd, 1 odd+R1 (worker.py:151-210) — so each number is
the real per-chip training rate, not a cherry-picked variant.

Timeout-proofing (round 4, after BENCH_r03 rc=124):
  * Each recipe runs in its OWN SUBPROCESS with a hard wall-clock deadline.
    A hung axon tunnel kills one recipe, not the bench.
  * A full cumulative JSON line is printed after EVERY recipe — the driver
    parses the tail, so the last complete line always carries every result
    measured so far even if a later recipe (or the whole process) dies.
  * The MFU pass no longer compiles anything: the warp FLOP meter fires at
    trace time and XLA FLOPs come from ``Lowered.cost_analysis()`` on the
    UNOPTIMIZED module — a host-side analysis, no device roundtrip. remat
    recompute is jaxpr-level so it is already visible pre-optimization.

``vs_baseline``: the reference publishes no throughput (BASELINE.md —
"published": {}), so the ratio is against 60 imgs/sec/chip, an H100-class
estimate for StyleGAN2-family training at 256² with R1 and the reference's
5-forward/2-backward schedule (BASELINE.json north star is ">= H100-class
imgs/sec/chip").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

H100_CLASS_ESTIMATE_IMGS_PER_SEC = 60.0

# TPU v5e peak bf16 matmul throughput (~197 TFLOP/s per chip). MFU numerator
# is XLA cost_analysis FLOPs (convs, incl. remat recompute) plus the Pallas
# warp kernels' self-reported matmul FLOPs (ops/warp_pallas.py flop_meter —
# XLA counts custom calls as zero). "useful" MFU instead credits the warp
# only its 16-tap gather-equivalent FLOPs, exposing the banded formulation's
# algorithmic overhead.
PEAK_FLOPS_PER_CHIP = 197e12

# (resolution, per-chip batch, deadline_s): the reference's per-GPU batches;
# memory fits measured on one 16G v5e (DESIGN.md) — 1024² runs b2/chip there
# (the 80G-class target hardware takes the reference's b4). Deadlines are
# generous for cold compiles (~20-40s each × 3 variants) but hard: a wedged
# tunnel costs one recipe, never the round's record.
RECIPES = [(256, 8, 1500), (512, 4, 1100), (1024, 2, 1500)]

# Overall budget: skip remaining recipes (recording why) rather than let the
# driver's outer timeout erase everything already measured. Sized so a warm
# 256+512 (with their MFU passes) still leaves 1024 a full attempt — the
# axon tunnel spends ~700s just loading 1024's cached executables. If the
# driver's outer timeout is tighter, the per-recipe cumulative emit already
# banked whatever finished.
TOTAL_BUDGET_S = float(os.environ.get("LCGAN_BENCH_BUDGET", 4200))


def _enable_cache():
    import jax

    cache_dir = os.environ.get("LCGAN_JAX_CACHE", os.path.expanduser("~/.cache/lcgan_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass


def _exec_ratio(trainer, state, cfg) -> float:
    """Executed/static warp matmul-work ratio under the dynamic band.

    One PLAIN generator forward captures every block's raw flow map
    (capture_intermediates, like tools/dynamics_probe); the flows are then
    rebuilt exactly as SynthesisBlock does (tanh∘box_filter, scaled
    identity-plus-flow grid) and priced EAGERLY with the kernels' own
    window math (warp_pallas._call_flops_estimate) — no jit around the
    estimate, so no custom_vjp/remat trace scopes are crossed (axon also
    has no host callbacks; both in-step designs failed, r4). Each
    Pallas-path block is priced as forward + backward kernels; the ratio
    is invariant to how many times the schedule replays the generator.
    """
    import jax
    import jax.numpy as jnp

    from lcgan_tpu.ops import warp_pallas
    from lcgan_tpu.ops.filters import box_filter_3x3
    from lcgan_tpu.ops.grid_sample import identity_like_coordinates, max_warp_displacement

    gen = trainer.generator

    @jax.jit
    def capture(params, stats, z1, z2):
        _, inter = gen.apply(
            {"params": params, "stats": stats},
            z1,
            z2,
            1.0,
            mutable=["intermediates"],
            capture_intermediates=lambda mdl, name: mdl.name == "flow_layer",
        )
        return inter["intermediates"]

    key = jax.random.PRNGKey(0)
    z1 = jax.random.normal(key, (cfg.batch_size, cfg.geo_noise_dim))
    z2 = jax.random.normal(key, (cfg.batch_size, cfg.app_noise_dim))
    inter = capture(state.g_params, state.g_stats, z1, z2)

    nb = cfg.num_blocks
    base_nf = cfg.resolved_base_nf
    itemsize = 2 if cfg.compute_dtype == "bfloat16" else 4
    prev = warp_pallas._exec_collect
    warp_pallas._exec_collect = (ex, st) = ([], [])
    try:
        for bi in range(nb):
            raw = jax.tree.leaves(inter[f"block_{bi}"]["flow_layer"])[0]
            flow = jnp.tanh(box_filter_3x3(raw.astype(jnp.float32)))
            b, h, w, _ = flow.shape
            if h < cfg.warp_pallas_min_res:
                continue  # XLA banded path — not in the Pallas flop meter
            grid = identity_like_coordinates(b, h, w) + flow * cfg.max_flow_scale
            c = min(base_nf * 2 ** (nb - bi - 1), cfg.max_nf)
            m = max_warp_displacement(h, cfg.max_flow_scale)
            warp_pallas._call_flops_estimate((b, h, w, c), itemsize, grid, int(m), True)
    finally:
        warp_pallas._exec_collect = prev
    static = float(sum(st))
    executed = float(sum(float(e) for e in ex))
    if static <= 0 or executed <= 0:
        raise ValueError("no Pallas-path warp blocks at this resolution")
    return min(executed / static, 1.0)


def measure(res: int, per_chip_batch: int, n_chips: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcgan_tpu.config import Config
    from lcgan_tpu.train.steps import Trainer

    t_start = time.perf_counter()
    cfg = Config(
        model_name="/tmp/lcgan_bench",
        img_resolution=res,
        batch_size=per_chip_batch * n_chips,
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
        rng.uniform(-1, 1, (cfg.batch_size, res, res, 3)).astype(np.float32)
    )
    batch = {"image": mk(), "geometry_change": mk(), "appearance_change": mk()}

    # warmup: compile all three schedule variants. NOTE: on the experimental
    # axon platform block_until_ready can return before execution finishes;
    # materializing a loss VALUE is the only reliable barrier.
    for epoch in range(0, 10):
        state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)
    float(g_loss)

    iters = 16 if res <= 512 else 8
    t0 = time.perf_counter()
    for epoch in range(8, 8 + iters):
        state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)
    # the last loss transitively depends on every prior step's state
    float(g_loss), float(d_loss)
    dt = time.perf_counter() - t0
    ips = cfg.batch_size * iters / dt / n_chips

    # ---- MFU: schedule-weighted per-8 mix of the three step variants.
    # Prefer Lowered.cost_analysis() (host-side, no compile) — but the axon
    # backend returns None there, so fall back to compiled cost_analysis.
    # The fallback is a PERSISTENT-CACHE HIT, not a recompile: the fresh jit
    # builds the identical HLO (same _build_raw + donate_argnums=0) the
    # timing loop just compiled. Time-gated anyway: a recipe that already
    # burned its budget ships without mfu rather than risking the deadline.
    mfu = mfu_useful = None
    # 900s: even with a warm persistent cache the axon tunnel re-loads the
    # three executables slowly; the recipe deadline (1500s at 256²) still
    # leaves ~10 min of guard band after the MFU pass.
    mfu_time_left = time.perf_counter() - t_start < float(os.environ.get("LCGAN_MFU_SKIP_AFTER", 900))
    try:
        from lcgan_tpu.ops import warp_pallas

        flops, warp_flops = {}, {}
        for name, epoch in (("even", 8), ("odd", 11), ("r1", 9)):
            # fresh jit of the raw fn: the timing loop's cached variant
            # would replay its jaxpr on .lower() and never re-fire the
            # warp kernels' trace-time FLOP meter
            fn = jax.jit(trainer.step_raw(epoch), donate_argnums=0)
            with warp_pallas.flop_meter() as acc:
                lowered = fn.lower(state, batch)
            ca = lowered.cost_analysis()
            if not ca or not ca.get("flops"):
                if not mfu_time_left:
                    raise TimeoutError("skipping compiled cost_analysis: recipe over time budget")
                ca = lowered.compile().cost_analysis()
            xla = float((ca or {}).get("flops", 0.0))
            flops[name] = (xla + acc[0], xla + acc[1])
            warp_flops[name] = float(acc[0])
        avg = lambda i: (4 * flops["even"][i] + 3 * flops["odd"][i] + flops["r1"][i]) / 8.0
        # cost_analysis reports the PER-DEVICE partitioned module's FLOPs
        # (and the warp meter fires on per-device local shapes under
        # shard_map), so avg() is already per-chip work per step — every
        # chip executes every step, so the rate is steps/sec, NOT divided
        # by n_chips a second time.
        steps_per_sec = iters / dt
        mfu = round(avg(0) * steps_per_sec / PEAK_FLOPS_PER_CHIP, 4)
        mfu_useful = round(avg(1) * steps_per_sec / PEAK_FLOPS_PER_CHIP, 4)

        # ---- executed-work correction (VERDICT r3 weak #3): under the
        # default dynamic band the kernels execute a data-dependent subset
        # of the static band, so the static `mfu` is an upper bound. One
        # plain generator forward captures the flows and the window math
        # prices them eagerly (_exec_ratio); every variant's warp FLOPs
        # scale by the measured executed/static ratio — the flows (hence
        # per-site fractions) are shared across variants and schedule
        # replays, so the ratio carries within a few percent.
        if mfu_time_left:
            ratio = None
            try:
                ratio = _exec_ratio(trainer, state, cfg)
            except Exception:  # pragma: no cover - capture/backends
                ratio = None
            if ratio is not None:
                warp_avg = (4 * warp_flops["even"] + 3 * warp_flops["odd"] + warp_flops["r1"]) / 8.0
                xla_avg = avg(0) - warp_avg
                mfu_static_bound = mfu
                mfu = round((xla_avg + ratio * warp_avg) * steps_per_sec / PEAK_FLOPS_PER_CHIP, 4)
                return {
                    "ips": round(ips, 2),
                    "mfu": mfu,
                    "mfu_useful": mfu_useful,
                    "mfu_static_bound": mfu_static_bound,
                    "warp_exec_ratio": round(ratio, 4),
                }
    except Exception:  # pragma: no cover - cost_analysis backend support
        pass
    return {"ips": round(ips, 2), "mfu": mfu, "mfu_useful": mfu_useful}


def _devices_or_die(timeout_s: float = 240.0) -> int:
    """Backend init with a watchdog: the experimental axon tunnel can hang
    jax.devices() FOREVER when the relay is down (observed r3) — die with a
    distinct rc instead of wedging the recipe subprocess to its deadline."""
    import threading

    result = {}

    def probe():
        import jax

        result["n"] = jax.device_count()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "n" not in result:
        print(json.dumps({"error": f"device init hung > {int(timeout_s)}s"}), flush=True)
        os._exit(3)
    return result["n"]


def _recipe_main(res: int, per_chip_batch: int) -> None:
    """Child mode: measure ONE recipe, print its JSON as the last line."""
    _enable_cache()
    n_chips = _devices_or_die()
    out = measure(res, per_chip_batch, n_chips)
    print(json.dumps(out), flush=True)


def _emit(results: dict, errors: dict) -> None:
    """Print the full cumulative record as one JSON line."""
    r256 = results.get(256) or {}
    per_chip = r256.get("ips")
    out = {
        "metric": "train_imgs_per_sec_per_chip_256",
        "value": per_chip,
        "unit": "imgs/sec/chip",
        "vs_baseline": round(per_chip / H100_CLASS_ESTIMATE_IMGS_PER_SEC, 3)
        if isinstance(per_chip, float)
        else 0.0,
        "mfu_256": r256.get("mfu"),
        "mfu_useful_256": r256.get("mfu_useful"),
    }
    if r256.get("warp_exec_ratio") is not None:
        out["mfu_static_bound_256"] = r256.get("mfu_static_bound")
        out["warp_exec_ratio_256"] = r256.get("warp_exec_ratio")
    for res in (512, 1024):
        r = results.get(res) or {}
        out[f"imgs_per_sec_per_chip_{res}"] = r.get("ips")
        out[f"mfu_{res}"] = r.get("mfu")
        out[f"mfu_useful_{res}"] = r.get("mfu_useful")
        if r.get("warp_exec_ratio") is not None:
            out[f"mfu_static_bound_{res}"] = r.get("mfu_static_bound")
            out[f"warp_exec_ratio_{res}"] = r.get("warp_exec_ratio")
    if errors:
        out["errors"] = {str(k): v for k, v in errors.items()}
    print(json.dumps(out), flush=True)


def _run_recipe_once(res: int, b: int, deadline: float, results: dict, errors: dict) -> bool:
    """One subprocess attempt at a recipe. Returns True on success."""
    cmd = [sys.executable, os.path.abspath(__file__), "--recipe", str(res), str(b)]
    try:
            # own session so a deadline kill reaps the WHOLE process group —
            # subprocess.run's timeout only kills the direct child, leaving
            # grandchildren holding the TPU
        proc = subprocess.Popen(
            cmd,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            start_new_session=True,
        )
        try:
            stdout, _ = proc.communicate(timeout=deadline)
        except subprocess.TimeoutExpired:
            import signal

            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            proc.wait()
            errors[res] = "timeout"
            return False
        line = next(
            (l for l in reversed(stdout.splitlines()) if l.startswith("{")),
            None,
        )
        rec = json.loads(line) if line else None
        if rec and "ips" in rec:
            results[res] = rec
            errors.pop(res, None)
            return True
        errors[res] = (rec or {}).get("error") or f"rc={proc.returncode}"
    except Exception as e:  # pragma: no cover
        errors[res] = type(e).__name__
    return False


def main() -> None:
    t_start = time.monotonic()
    results, errors = {}, {}
    for res, b, deadline in RECIPES:
        # Up to 2 attempts: the experimental axon tunnel drops connections
        # mid-compile (r3/r4 observed "remote_compile: response body closed")
        # — one retry usually lands because the compile cache kept progress.
        for _attempt in range(2):
            remaining = TOTAL_BUDGET_S - (time.monotonic() - t_start)
            if remaining < 120:
                errors.setdefault(res, "skipped_budget")
                break
            if _run_recipe_once(res, b, min(deadline, remaining), results, errors):
                break
        _emit(results, errors)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--recipe":
        _recipe_main(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
