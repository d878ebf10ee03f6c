"""Subprocess worker for tests/test_multiprocess.py — a REAL multi-process
data-parallel run (2 processes x 4 CPU devices = one 8-device global mesh,
collectives over gloo), exercising exactly the paths that are single-process
no-ops everywhere else in the suite:

  * ``jax.distributed.initialize`` + a mesh spanning non-addressable devices
    (the reference's NCCL DDP world, loader.py:13-19, worker.py:88-96)
  * per-process batch feeding via ``make_array_from_process_local_data``
    (train/steps.py train_iteration)
  * freezeD + R1 schedule variants under the multi-process mesh
  * the rank-0 artifact paths (monitor / fakes) that consume ONLY host-local
    replicas — the pre-round-3 implementation deadlocked here
  * the sharded FID phase (cross-process feature gather, eval/fid.py)

Writes a JSON result (param digests, losses, fid) for the parent to compare
across processes and against a single-process 8-device oracle.

Not a pytest module (no ``test_`` prefix): invoked as
``python tests/mp_worker.py <pid> <nproc> <port> <outdir>``.
"""

import json
import os
import sys


def tree_abs_sums(tree):
    """Per-leaf abs-sums keyed by path — an order-stable numeric digest."""
    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        jax.tree_util.keystr(path): float(np.sum(np.abs(np.asarray(leaf))))
        for path, leaf in flat
    }


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nproc)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np

    from lcgan_tpu.config import Config
    from lcgan_tpu.parallel.mesh import make_mesh
    from lcgan_tpu.train.steps import Trainer, _host_local

    cfg = Config(
        model_name=os.path.join(outdir, "run"),
        dataset_path=os.path.join(outdir, "ds"),
        img_resolution=16,
        batch_size=8,
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
        num_fakes=2,
        freezeD_start=4,
        freezeD_layer=1,
        adam_eps=1e-3,  # damp first-step sign flips (see test_train.py DP test)
        num_data_workers=1,
    )
    if pid == 0:
        cfg.make_run_dirs()

    mesh = make_mesh()
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.init_state()

    # Deterministic GLOBAL batches; this process feeds rows
    # [pid*4, (pid+1)*4) — the DistributedSampler contract (worker.py:45-73).
    local_b = cfg.batch_size // nproc
    losses = []
    for epoch in range(5):  # even, odd+R1, even, odd, even+frozen
        rng = np.random.default_rng(100 + epoch)
        batch_global = {
            k: rng.uniform(-1, 1, (cfg.batch_size, 16, 16, 3)).astype(np.float32)
            for k in ("image", "geometry_change", "appearance_change")
        }
        batch_local = {
            k: v[pid * local_b : (pid + 1) * local_b] for k, v in batch_global.items()
        }
        state, g_loss, d_loss = trainer.train_iteration(state, batch_local, epoch)
        losses.append(
            [
                float(jax.device_get(g_loss.addressable_data(0))),
                float(jax.device_get(d_loss.addressable_data(0))),
            ]
        )

    # ---- rank-0 artifact paths: pre-round-3 these consumed globally-sharded
    # state from one process and deadlocked a real multi-process mesh ----
    if pid == 0:
        from lcgan_tpu.gen.artifacts import fake_image_generation, monitor_current_result

        fake_image_generation(cfg, trainer, state)
        monitor_current_result(
            cfg, trainer, state, epoch=5, num_explore=1, images_per_output=8, num_clips=1
        )

    # ---- sharded FID: collective — every process participates. The fence
    # keeps pid 1 from entering FID's first collective while pid 0 renders
    # artifacts above (gloo's context key-exchange times out at 30s). ----
    from lcgan_tpu.parallel.mesh import process_barrier

    process_barrier("pre_fid")
    from lcgan_tpu.eval.fid import fid_evaluate

    fid = fid_evaluate(cfg, trainer, state, num_images=8)

    # ---- collective checkpoint save + restore: orbax save of mesh-global
    # arrays must be called by EVERY process (a rank-0-only call deadlocks
    # in orbax's internal cross-process sync — the bug loop.py used to have)
    from lcgan_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(outdir, "run", "model"))
    ckpt.save(state)
    restored = ckpt.restore(state)
    for a, b in zip(jax.tree.leaves(state.g_params), jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(
            np.asarray(_host_local(a)), np.asarray(_host_local(b))
        )
    process_barrier("post_ckpt")

    host_state = _host_local(
        {"g": state.g_params, "d": state.d_params, "ema": state.ema_params}
    )
    result = {
        "pid": pid,
        "losses": losses,
        "fid": float(fid),
        "sums": tree_abs_sums(host_state),
    }
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"[mp_worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
