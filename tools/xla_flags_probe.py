"""Sweep TPU XLA flags over the real train step and report imgs/sec.

XLA flags are process-global (read once at backend init), so each combo
runs in a fresh subprocess executing this module's ``--child`` mode: build
the 256² (or --res) trainer, run the reference schedule mix, print one
imgs/sec number. The parent collects a table. Compile cache keys include
the flag set, so the first run of each combo pays a full compile — budget
~10 min per NEW combo on the v5e, seconds after.

Candidate flags (v5e, single chip):
  * scoped_vmem_limit_kib — more VMEM scratch lets the fusion emitter keep
    bigger tiles live (the step is full of conv+elementwise fusions).
  * latency hiding scheduler knobs are defaults-on for TPU; listed combos
    only touch documented, stable flags.

Usage: python -m tools.xla_flags_probe [--res 256] [--batch 8] [--iters 12]

CAVEAT (measured r4): under the experimental axon tunnel the LOCAL client
links a CPU-only XLA whose flag parser hard-crashes on any --xla_tpu_*
flag, while the real TPU compilation happens server-side — so the TPU
combos report FAILED there and only the baseline measures. Run the sweep
on a host with a native TPU client.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

COMBOS = [
    ("baseline", ""),
    ("vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem_32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    # async / overlapped DMA aggressiveness on fusions
    ("aggressive_fusion", "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
]


def child(res: int, batch: int, iters: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lcgan_tpu.config import Config
    from lcgan_tpu.train.steps import Trainer

    cfg = Config(
        model_name="/tmp/lcgan_flagsweep",
        img_resolution=res,
        batch_size=batch,
        compute_dtype="bfloat16",
        freezeD_start=10**9,
    )
    trainer = Trainer(cfg, mesh=None)
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.uniform(-1, 1, (batch, res, res, 3)).astype(np.float32))
    data = {"image": mk(), "geometry_change": mk(), "appearance_change": mk()}
    for epoch in range(10):  # compile all three variants
        state, g_loss, d_loss = trainer.train_iteration(state, data, epoch)
    float(g_loss)
    t0 = time.perf_counter()
    for epoch in range(8, 8 + iters):
        state, g_loss, d_loss = trainer.train_iteration(state, data, epoch)
    float(g_loss), float(d_loss)
    dt = time.perf_counter() - t0
    print(json.dumps({"ips": batch * iters / dt}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child:
        child(args.res, args.batch, args.iters)
        return

    for name, flags in COMBOS:
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = f"{base} {flags}".strip()
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-m", "tools.xla_flags_probe", "--child",
             "--res", str(args.res), "--batch", str(args.batch), "--iters", str(args.iters)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            ips = json.loads(line)["ips"]
            print(f"{name:20s} {ips:7.2f} imgs/sec   (wall {time.time()-t0:5.0f}s)  {flags}",
                  flush=True)
        except Exception:
            err = (proc.stderr or "").strip().splitlines()
            print(f"{name:20s} FAILED: {err[-1] if err else proc.returncode}  {flags}",
                  flush=True)


if __name__ == "__main__":
    main()
