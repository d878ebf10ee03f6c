"""True multi-PROCESS data-parallel execution (SURVEY §2.4 multi-host DP).

Everything else in the suite runs single-process over 8 fake devices; the
multi-process-only code paths (cross-process collectives, per-process batch
feeding, rank-0 artifact generation against a mesh with non-addressable
devices, the sharded FID gather) were previously validated only by design.
This test spawns TWO real OS processes (4 CPU devices each) joined into one
8-device global mesh via ``jax.distributed.initialize`` — collectives run
over gloo, the same client API a real multi-host TPU pod uses — runs 5 train
iterations covering every schedule variant (even / odd+R1 / frozen), the
rank-0 monitor + fakes paths, and a sharded FID eval, then asserts:

  1. both processes finish (no deadlock — bounded by a hard timeout),
  2. the replicated state is IDENTICAL across processes,
  3. the result matches a single-process 8-device oracle running the same
     global batches (same mesh shape, no distributed runtime).
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest
from PIL import Image

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_matches_single_process_oracle(tmp_path):
    # tiny synthetic dataset for the FID phase (both processes read it)
    ds = tmp_path / "ds" / "train" / "x"
    ds.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            ds / f"{i}.png"
        )

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    # gloo's context key-exchange hard-caps at ~30s; under heavy machine load
    # (concurrent compiles on a 1-core box) a worker can blow that window and
    # die with a transport/coordination timeout that says nothing about the
    # code under test. Retry up to TWICE with backoff (load spikes pass),
    # and only for that failure signature — anything else fails immediately.
    _TRANSIENT = ("DEADLINE_EXCEEDED", "Timed out", "timed out", "Connection refused")

    def run_workers():
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
            for pid in range(2)
        ]
        outs = []
        try:
            for p in procs:
                # generous: under load (e.g. a concurrent TPU compile) the two
                # CPU workers can take several× the uncontended ~6 min
                out, _ = p.communicate(timeout=1500)
                outs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return procs, outs

    procs, outs = run_workers()
    for _backoff in (15, 60):  # two retries, spaced — load spikes pass
        if not (
            any(p.returncode != 0 for p in procs)
            and any(sig in out for out in outs for sig in _TRANSIENT)
        ):
            break
        time.sleep(_backoff)
        procs, outs = run_workers()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))

    # ---- cross-process agreement: replicated state must be identical ----
    assert results[0]["sums"].keys() == results[1]["sums"].keys()
    for k in results[0]["sums"]:
        np.testing.assert_allclose(
            results[0]["sums"][k], results[1]["sums"][k], rtol=0, atol=0, err_msg=k
        )
    np.testing.assert_allclose(results[0]["fid"], results[1]["fid"], rtol=1e-6)
    assert np.all(np.isfinite(np.asarray(results[0]["losses"])))
    assert np.isfinite(results[0]["fid"])

    # rank-0 artifacts actually landed (fakes/NNNN_images.jpg + monitor mp4s)
    fakes = tmp_path / "run" / "fakes"
    assert (fakes / "0000_images.jpg").exists(), list(fakes.iterdir())
    samples = tmp_path / "run" / "samples"
    assert any(f.suffix in (".mp4", ".gif") for f in samples.iterdir()), list(
        samples.iterdir()
    )

    # ---- single-process 8-device oracle: same global batches, same mesh
    # shape, no distributed runtime (conftest forces 8 fake CPU devices) ----
    import jax

    from lcgan_tpu.config import Config
    from lcgan_tpu.parallel.mesh import make_mesh
    from lcgan_tpu.train.steps import Trainer
    from tests.mp_worker import tree_abs_sums

    cfg = Config(
        model_name=str(tmp_path / "oracle"),
        dataset_path=str(tmp_path / "ds"),
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
        adam_eps=1e-3,
        num_data_workers=1,
    )
    trainer = Trainer(cfg, mesh=make_mesh())
    state = trainer.init_state()
    for epoch in range(5):
        b_rng = np.random.default_rng(100 + epoch)
        batch = {
            k: b_rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
            for k in ("image", "geometry_change", "appearance_change")
        }
        state, _, _ = trainer.train_iteration(state, batch, epoch)
    oracle = tree_abs_sums(
        jax.device_get({"g": state.g_params, "d": state.d_params, "ema": state.ema_params})
    )
    assert oracle.keys() == results[0]["sums"].keys()
    for k in oracle:
        # gloo all-reduce vs single-process reduction: fp ordering only
        np.testing.assert_allclose(
            results[0]["sums"][k], oracle[k], rtol=1e-4, atol=1e-5, err_msg=k
        )
