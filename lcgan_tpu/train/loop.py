"""Phase orchestration + train loop (loader.py:22-110, TPU-native).

One process per host (JAX owns all local devices); the reference's
mp.spawn-per-GPU layer disappears (SURVEY.md §2.4). ``dist.barrier`` fences
around rank-0 I/O become block_until_ready + process-0 guards.

File contract kept identical: args.txt, epoch.txt, log.txt (exact line
format of loader.py:64-66), samples/, model/, fakes/, demo/, fid.txt.
"""

from __future__ import annotations

import os
from datetime import datetime
from typing import Optional

import jax
import numpy as np

from lcgan_tpu.config import Config
from lcgan_tpu.data.dataset import ImageFolderDataset, Prefetcher, TrainInputPipeline
from lcgan_tpu.gen.artifacts import demo_generation, fake_image_generation, monitor_current_result
from lcgan_tpu.parallel import make_mesh
from lcgan_tpu.parallel.mesh import process_barrier
from lcgan_tpu.train.steps import Trainer
from lcgan_tpu.utils.checkpoint import CheckpointManager, read_epoch_file, write_epoch_file


def _is_main() -> bool:
    return jax.process_index() == 0


def build_trainer(cfg: Config) -> Trainer:
    mesh = make_mesh() if jax.device_count() > 1 else None
    return Trainer(cfg, mesh=mesh)


def load_or_init_state(cfg: Config, trainer: Trainer):
    """Resume from checkpoint if present (loader.py:36-42).

    The checkpoint alone decides whether weights are restored; epoch.txt only
    gates the resume epoch. (A run dir holding a copied state but no
    epoch.txt — e.g. a transplanted state_best — must still restore, or eval
    phases would silently run on random weights.)
    """
    state = trainer.init_state()
    ckpt = CheckpointManager(cfg.run_dirs()["model"])
    start_epoch = 0
    if ckpt.exists(best=cfg.best):
        state = ckpt.restore(state, best=cfg.best)
        last_epoch = read_epoch_file(cfg.model_name)
        if last_epoch is not None:
            start_epoch = last_epoch + 1
        if _is_main():
            print(f"restart training from: {start_epoch}")
    return state, start_epoch, ckpt


def make_train_pipeline(cfg: Config) -> Prefetcher:
    dataset = ImageFolderDataset(cfg.dataset_path, cfg.img_resolution, is_train=True, seed=cfg.seed)
    if _is_main():
        print(f"Train dataset size: {len(dataset)}")
    pipeline = TrainInputPipeline(
        dataset,
        batch_size=cfg.batch_size,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        num_workers=cfg.num_data_workers,
        seed=cfg.seed,
    )
    return Prefetcher(pipeline, depth=2)


def train(cfg: Config):
    cfg.validate()
    cfg.make_run_dirs()
    if _is_main():
        cfg.dump(os.path.join(cfg.model_name, "args.txt"))  # loader.py:27-28

    trainer = build_trainer(cfg)
    state, epoch, ckpt = load_or_init_state(cfg, trainer)
    data = make_train_pipeline(cfg)
    start_time = datetime.now()

    # profiler window relative to the START epoch (a resume past absolute
    # epoch 12 would otherwise never start — and then crash in stop_trace)
    profile_start = epoch + 12  # steady state: past all variant compiles
    profile_stop = min(profile_start + 8, cfg.epoch)
    profiling = bool(cfg.profile_dir)
    tracing = False
    while epoch <= cfg.epoch:
        batch = next(data)
        if profiling and epoch == profile_start:
            jax.profiler.start_trace(cfg.profile_dir)
            tracing = True
        state, g_loss, d_loss = trainer.train_iteration(state, batch, epoch)
        if tracing and epoch >= profile_stop:
            jax.block_until_ready(state)
            jax.profiler.stop_trace()
            profiling = tracing = False

        if epoch % cfg.print_interval == 0:
            g, d = float(g_loss), float(d_loss)  # blocks, == barrier fence
            if _is_main():
                elapsed = str(datetime.now() - start_time).split(".")[0]
                mode = "w" if epoch == 0 else "a"
                with open(os.path.join(cfg.model_name, "log.txt"), mode) as f:
                    f.write(
                        f"epoch:{epoch}, elapsed:{elapsed}, g_loss:{g:.6f}, d_loss:{d:.6f} \n"
                    )

        if epoch % cfg.show_interval == 0 and epoch > 0:
            if _is_main():
                # images_per_output=geo_noise_dim: the reference's training
                # loop overrides the worker.py:255 default of 32 with
                # args.geo_noise_dim at loader.py:72 — ONE group of 64 dims
                # per modality at defaults, not two groups of 32.
                monitor_current_result(
                    cfg, trainer, state, epoch=epoch, num_explore=20, w_psi=cfg.w_psi,
                    images_per_output=cfg.geo_noise_dim,
                )
            # dist.barrier fence (loader.py:73): without it, non-zero
            # processes race into the next iteration's collective while
            # process 0 renders, and the transport rendezvous can time out.
            process_barrier(f"monitor_{epoch}")

        if epoch % cfg.save_interval == 0 and epoch > 0:
            jax.block_until_ready(state)
            if _is_main():
                print("save model")
            # Orbax save of mesh-global arrays is a COLLECTIVE — every
            # process participates (process 0 alone would deadlock in
            # orbax's internal sync). Only the sidecar write is rank-0.
            ckpt.save(state)
            if _is_main():
                write_epoch_file(cfg.model_name, epoch)
            process_barrier(f"save_{epoch}")  # loader.py:80

        epoch += 1

    jax.block_until_ready(state)
    return state


def run_phase(cfg: Config):
    """Top-level phase dispatch (loader.py:26,84,95,101)."""
    if cfg.phase == "train":
        return train(cfg)

    trainer = build_trainer(cfg)
    state, _, ckpt = load_or_init_state(cfg, trainer)
    if not ckpt.exists(best=cfg.best):
        raise FileNotFoundError(
            f"no checkpoint under {cfg.run_dirs()['model']} (run the train phase first)"
        )

    if cfg.phase == "fid_eval":
        from lcgan_tpu.eval.fid import fid_evaluate

        fid_value = fid_evaluate(cfg, trainer, state)
        if _is_main():
            # fixes the reference's os.path.join(..., 'fid.txt', 'w') bug (loader.py:91)
            with open(os.path.join(cfg.model_name, "fid.txt"), "w") as f:
                f.write(f"FID:{fid_value} \n")
        # best-FID checkpoint: the reference defines save_best_model /
        # best_fid but never invokes them (worker.py:229,42; SURVEY §5) —
        # here a new best FID snapshots the state for --best loading.
        # fid_value is identical on every process (sharded features are
        # globally gathered) and the run dir is shared, so each process
        # reaches the same decision; the save itself is collective.
        best_path = os.path.join(cfg.model_name, "best_fid.txt")
        best = float("inf")
        if os.path.exists(best_path):
            with open(best_path) as f:
                best = float(f.read().strip())
        if fid_value < best:
            if _is_main():
                print("save best model")
            ckpt.save(state, best=True)
            if _is_main():
                with open(best_path, "w") as f:
                    f.write(str(fid_value))
        process_barrier("fid_save")
        return fid_value

    if cfg.phase == "fake_image_generation":
        if _is_main():
            fake_image_generation(cfg, trainer, state)
        return None

    if cfg.phase == "video_generation":
        if _is_main():
            if cfg.ctrl_dim == -1:  # loader.py:106-108
                for i in range(cfg.geo_noise_dim + cfg.app_noise_dim):
                    demo_generation(cfg, trainer, state, controlled_dim=i, num_video=cfg.num_videos)
            else:
                demo_generation(
                    cfg, trainer, state, controlled_dim=cfg.ctrl_dim, num_video=cfg.num_videos
                )
        return None

    raise ValueError(f"unknown phase: {cfg.phase}")
