"""CLI — same 33 flags, same phases as the reference (main.py:12-61).

Differences from the reference launcher (main.py:98-116): no per-GPU
process spawn — one process per host, JAX owns all local devices, and
multi-host runs initialize via ``jax.distributed`` when coordinator env
vars are present. TPU-native extensions are grouped at the bottom.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from lcgan_tpu.config import Config


def build_parser() -> argparse.ArgumentParser:
    desc = "TPU-native JAX implementation of LC-GAN"
    p = argparse.ArgumentParser(description=desc)

    p.add_argument("--phase", type=str, default="train",
                   help="one of: train | fid_eval | fake_image_generation | video_generation")
    p.add_argument("--best", default=False, action="store_true",
                   help="restore the best-FID snapshot instead of the latest")

    p.add_argument("--tau", type=float, default=0.05,
                   help="temperature of the InfoNCE contrastive term")
    p.add_argument("--l_adv", type=float, default=1.0,
                   help="adversarial-loss weight (parsed but unused, as in the reference)")
    p.add_argument("--l_aux", type=float, default=0.5,
                   help="contrastive (auxiliary) loss weight")
    p.add_argument("--l_r1", type=float, default=10.0,
                   help="R1 gradient-penalty weight")
    p.add_argument("--l_s", type=float, default=0.0000001,
                   help="L1 sparsity weight on the mapping nets' diagonal factors")

    p.add_argument("--max_flow_scale", type=float, default=0.1,
                   help="cap on the per-block warp flow magnitude")
    p.add_argument("--geo_noise_dim", type=int, default=64,
                   help="geometry z-space size")
    p.add_argument("--app_noise_dim", type=int, default=64,
                   help="appearance z-space size")
    p.add_argument("--geo_projection_dim", type=int, default=256,
                   help="geometry embedding size of the D projection head")
    p.add_argument("--app_projection_dim", type=int, default=256,
                   help="appearance embedding size of the D projection head")
    p.add_argument("--geo_latent_dim", type=int, default=64,
                   help="geometry w-space size")
    p.add_argument("--app_latent_dim", type=int, default=512,
                   help="appearance w-space size")

    p.add_argument("--epoch", type=int, default=100000,
                   help="total training iterations (the reference calls one batch an 'epoch')")
    p.add_argument("--batch_size", type=int, default=32,
                   help="global batch, split across devices")
    p.add_argument("--g_lr", type=float, default=0.002, help="generator Adam step size")
    p.add_argument("--d_lr", type=float, default=0.002, help="discriminator Adam step size")
    p.add_argument("--beta1", type=float, default=0.0, help="Adam first-moment coefficient")
    p.add_argument("--beta2", type=float, default=0.99, help="Adam second-moment coefficient")
    p.add_argument("--g_ema_decay", type=float, default=0.9999,
                   help="generator weight-averaging decay")
    p.add_argument("--g_ema_start", type=int, default=0,
                   help="iteration at which EMA averaging kicks in (plain copy before)")
    p.add_argument("--freezeD_start", type=int, default=100000,
                   help="iteration at which the early D layers stop updating")
    p.add_argument("--freezeD_layer", type=int, default=5,
                   help="how many leading D blocks freezeD locks")

    p.add_argument("--img_resolution", type=int, default=256,
                   help="output image side length (256/512/1024)")
    p.add_argument("--img_ch", type=int, default=3, help="output channel count")
    p.add_argument("--psi", type=float, default=2.0,
                   help="z-space sweep amplitude for demo videos")
    p.add_argument("--w_psi", type=float, default=1.0,
                   help="w-space truncation strength at inference (<=0: training mode)")

    p.add_argument("--dataset_path", type=str, default="./",
                   help="root containing the train/ image folder")
    p.add_argument("--model_name", type=str, default="",
                   help="run directory (holds model/, samples/, logs)")
    p.add_argument("--save_dir", type=str, default="model",
                   help="checkpoint subdirectory inside the run dir")
    p.add_argument("--sample_dir", type=str, default="samples",
                   help="monitor-output subdirectory inside the run dir")

    p.add_argument("--num_fakes", type=int, default=10,
                   help="batches of fake images to write in fake_image_generation")
    p.add_argument("--ctrl_dim", type=int, default=-1,
                   help="latent dimension swept by video_generation (-1: all of them)")
    p.add_argument("--num_videos", type=int, default=10,
                   help="videos rendered per controlled dimension")

    p.add_argument("--save_interval", type=int, default=5000,
                   help="iterations between checkpoint snapshots")
    p.add_argument("--print_interval", type=int, default=100,
                   help="iterations between log.txt lines")
    p.add_argument("--show_interval", type=int, default=1000,
                   help="iterations between sweep-video monitors")

    # --- TPU-native extensions ---
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="conv/matmul compute dtype (params stay fp32)")
    p.add_argument("--seed", type=int, default=0, help="global PRNG seed")
    p.add_argument("--inception_weights", type=str, default="",
                   help="path to pytorch-fid pt_inception .pth for FID eval")
    p.add_argument("--remat_blocks", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="rematerialize G/D blocks in backward (--no-remat_blocks to disable)")
    p.add_argument("--remat_save_g_convs", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="save G blocks' conv outputs so the remat backward skips the conv recompute")
    p.add_argument("--remat_save_d_convs", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="same conv-save policy on the D trunk "
                        "(on-device A/B win, DESIGN.md round-4 notes)")
    p.add_argument("--remat_save_max_res", type=int, default=1024,
                   help="largest block output map the conv-save remat policies apply to")
    p.add_argument("--view_batched_steps", default=False,
                   action=argparse.BooleanOptionalAction,
                   help="fuse the even iteration's per-view G/D applications into batched ones")
    p.add_argument("--base_nf", type=int, default=None,
                   help="override the per-resolution channel base (tiny models / ablations)")
    p.add_argument("--max_nf", type=int, default=512, help="channel cap per block")
    p.add_argument("--mbstd_group_size", type=int, default=8,
                   help="minibatch-std group size in the D epilogue")
    p.add_argument("--adam_eps", type=float, default=1e-8, help="Adam epsilon")
    p.add_argument("--num_data_workers", type=int, default=4, help="host data worker threads")
    p.add_argument("--distributed", type=str, default="auto", choices=["auto", "on", "off"],
                   help="initialize jax.distributed for multi-host runs: 'auto' when a "
                        "coordinator/pod environment is detected, 'on' to force (pass this "
                        "on TPU pod slices if auto-detection misses), 'off' never")
    p.add_argument("--warp_impl", type=str, default="auto",
                   choices=["auto", "pallas", "banded", "none"],
                   help="bicubic-warp backend (auto: fused Pallas kernel on TPU; "
                        "none: skip the warp — diagnostic ablations only)")
    p.add_argument("--warp_pallas_min_res", type=int, default=128,
                   help="auto mode: smallest map size routed to the fused kernel")
    p.add_argument("--warp_adaptive_band", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="size the fused warp's band by the measured flow with a "
                        "full-band fallback (exact either way)")
    p.add_argument("--profile_dir", type=str, default="", help="jax.profiler trace output dir")
    return p


def _explicit_flags(argv=None) -> dict:
    """The flags the user actually typed (re-parse with SUPPRESS defaults)."""
    p = build_parser()
    for action in p._actions:
        action.default = argparse.SUPPRESS
    return vars(p.parse_args(argv))


def parse_config(argv=None) -> Config:
    args = build_parser().parse_args(argv)
    fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(args).items() if k in fields})
    # Eval/generation phases reload the run's args.txt so model-geometry flags
    # (img_resolution, latent dims, base_nf, compute_dtype ...) never have to
    # be retyped to match the checkpoint; explicitly typed flags still win.
    # The reference dumps args.txt but never reloads it — eval must be
    # re-invoked with matching --img_resolution by hand (README.md:61-63).
    args_txt = os.path.join(cfg.model_name, "args.txt") if cfg.model_name else ""
    if cfg.phase != "train" and args_txt and os.path.exists(args_txt):
        cfg = Config.load(args_txt)
        cfg.phase = args.phase
        for k, v in _explicit_flags(argv).items():
            if k in fields:
                setattr(cfg, k, v)
    cfg.validate()
    return cfg


def main(argv=None):
    import jax

    # Honor JAX_PLATFORMS even when a pre-registered platform plugin (e.g.
    # the experimental 'axon' TPU tunnel) prepends itself to jax_platforms.
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except RuntimeError:
            pass  # backend already initialized

    # Persistent compilation cache: the 256²+ train-step variants take
    # minutes to compile — restarts and resumes shouldn't pay twice.
    cache_dir = os.environ.get("LCGAN_JAX_CACHE", os.path.expanduser("~/.cache/lcgan_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except RuntimeError:
        pass

    cfg = parse_config(argv)

    # Multi-host slices need the distributed runtime BEFORE any device use:
    # process_barrier fences and collective Orbax saves ride its coordination
    # service. 'auto' catches explicit coordinators and Cloud TPU pod markers;
    # jax.distributed.initialize() itself auto-detects addresses/ranks on TPU
    # pods. Pass --distributed on if a pod environment isn't auto-detected.
    # TPU_WORKER_HOSTNAMES is set to a single hostname even on one-host
    # boxes (the platform plugin injects it), so it only counts as a pod
    # marker when it actually lists multiple workers.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    pod_env = bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or ("," in workers)
    )
    if cfg.distributed == "on" or (cfg.distributed == "auto" and pod_env):
        jax.distributed.initialize()

    print(cfg)
    from lcgan_tpu.train.loop import run_phase

    run_phase(cfg)


if __name__ == "__main__":
    main()
