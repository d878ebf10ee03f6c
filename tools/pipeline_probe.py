"""Probe: host input-pipeline throughput vs TPU train-step demand.

SURVEY §7 flags host-side triple-view augmentation as a starvation risk at
1024² (the reference's CPU hot path is custom_dataset.py:59-88: PIL decode +
resize + albumentations Perspective + ColorJitter per sample). This probe
measures delivered imgs/sec of BOTH pipelines — the C++ native loader
(native/loader.cpp: libjpeg decode, bilinear resize, fused warp/jitter) and
the Python fallback (data/dataset.py + data/augment.py) — from a synthetic
JPEG corpus, per thread count, and compares against the measured TPU
consumption rate (BENCH_r04: ~19.3 imgs/sec/chip @256², ~1.8 @1024²).

The verdict feeds the num_data_workers default: the pipeline must beat the
consumption rate with headroom on the DEPLOYMENT host; this box has 1 core,
so treat absolute numbers as a floor and the native/Python RATIO as the
transferable result.

Usage: python -m tools.pipeline_probe [--sizes 256,1024] [--threads 1,2,4]
                                      [--n 64] [--batches 4]
Writes one JSON line per (size, path, threads) plus a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_corpus(root: str, n: int, src: int, seed: int = 0) -> None:
    from PIL import Image

    os.makedirs(os.path.join(root, "train", "x"), exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        p = os.path.join(root, "train", "x", f"{i:04d}.jpg")
        if not os.path.exists(p):
            arr = rng.integers(0, 255, (src, src, 3), dtype=np.uint8)
            Image.fromarray(arr).save(p, quality=90)


def measure(root: str, size: int, use_native: bool, threads: int, batch: int, batches: int) -> float:
    from lcgan_tpu.data.dataset import ImageFolderDataset, TrainInputPipeline

    ds = ImageFolderDataset(root, resized_size=size, is_train=True)
    pipe = TrainInputPipeline(
        ds, batch_size=batch, num_workers=threads, use_native=use_native, prefetch=0
    )
    if use_native and not pipe.use_native:
        return float("nan")  # native lib unavailable — report honestly
    next(pipe)  # warm caches, JIT-free but touches files once
    t0 = time.perf_counter()
    for _ in range(batches):
        next(pipe)
    dt = time.perf_counter() - t0
    return batch * batches / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="256,1024")
    ap.add_argument("--threads", type=str, default="1,2,4")
    ap.add_argument("--n", type=int, default=64, help="corpus size (images)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=4, help="timed batches")
    ap.add_argument("--root", type=str, default="/tmp/lcgan_pipe_probe")
    ap.add_argument(
        "--demand",
        type=str,
        default="256=19.3,512=5.9,1024=1.8",
        help="imgs/sec/chip the train step consumes (from BENCH)",
    )
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(",")]
    threads = [int(t) for t in args.threads.split(",")]
    demand = dict(
        (int(k), float(v)) for k, v in (kv.split("=") for kv in args.demand.split(","))
    )

    # source resolution: big enough that 1024² targets upscale realistically
    src = max(sizes)
    print(f"building {args.n}-image corpus at {src}² ...", flush=True)
    build_corpus(args.root, args.n, src)

    rows = []
    for size in sizes:
        for use_native in (True, False):
            for t in threads:
                ips = measure(args.root, size, use_native, t, args.batch, args.batches)
                row = {
                    "size": size,
                    "path": "native" if use_native else "python",
                    "threads": t,
                    "imgs_per_sec": round(ips, 2),
                    "vs_demand": round(ips / demand[size], 2) if size in demand and ips == ips else None,
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

    print("\nsize  path    thr  imgs/s   ×demand")
    for r in rows:
        print(
            f"{r['size']:5d} {r['path']:7s} {r['threads']:3d} {r['imgs_per_sec']:8.2f}"
            f"   {r['vs_demand'] if r['vs_demand'] is not None else '—'}"
        )


if __name__ == "__main__":
    main()
