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
                   help="train, fid_eval, fake_image_generation, or video_generation")
    p.add_argument("--best", default=False, action="store_true", help="Load the best model")

    p.add_argument("--tau", type=float, default=0.05, help="The margin of contrastive loss")
    p.add_argument("--l_adv", type=float, default=1.0, help="The weight of adversarial loss")
    p.add_argument("--l_aux", type=float, default=0.5, help="The weight of loss in auxiliary mapping")
    p.add_argument("--l_r1", type=float, default=10.0, help="The weight r1 regularization")
    p.add_argument("--l_s", type=float, default=0.0000001, help="The weight of sparsity regularization")

    p.add_argument("--max_flow_scale", type=float, default=0.1, help="maximum flow scale")
    p.add_argument("--geo_noise_dim", type=int, default=64, help="length of noise dimension")
    p.add_argument("--app_noise_dim", type=int, default=64, help="length of noise dimension")
    p.add_argument("--geo_projection_dim", type=int, default=256, help="length of projected dimension")
    p.add_argument("--app_projection_dim", type=int, default=256, help="length of projected dimension")
    p.add_argument("--geo_latent_dim", type=int, default=64, help="length of intermediate latent dimension")
    p.add_argument("--app_latent_dim", type=int, default=512, help="length of intermediate latent dimension")

    p.add_argument("--epoch", type=int, default=100000, help="The number of epochs to run")
    p.add_argument("--batch_size", type=int, default=32, help="The batch size")
    p.add_argument("--g_lr", type=float, default=0.002, help="The learning rate of the generator")
    p.add_argument("--d_lr", type=float, default=0.002, help="The learning rate of the discriminator")
    p.add_argument("--beta1", type=float, default=0.0, help="The beta1 of ADAM optimizer")
    p.add_argument("--beta2", type=float, default=0.99, help="The beta2 of ADAM optimizer")
    p.add_argument("--g_ema_decay", type=float, default=0.9999, help="decaying rate of EMA")
    p.add_argument("--g_ema_start", type=int, default=0, help="start step of applying EMA")
    p.add_argument("--freezeD_start", type=int, default=100000, help="start step of applying freezeD")
    p.add_argument("--freezeD_layer", type=int, default=5, help="first n layers of applying freezeD")

    p.add_argument("--img_resolution", type=int, default=256, help="The size of image resolution")
    p.add_argument("--img_ch", type=int, default=3, help="The size of image channel")
    p.add_argument("--psi", type=float, default=2.0, help="The truncation value of noise vector")
    p.add_argument("--w_psi", type=float, default=1.0, help="The truncation value of latent vector")

    p.add_argument("--dataset_path", type=str, default="./", help="dataset_name")
    p.add_argument("--model_name", type=str, default="", help="model name")
    p.add_argument("--save_dir", type=str, default="model", help="Directory name to save the model")
    p.add_argument("--sample_dir", type=str, default="samples",
                   help="Directory name to save the training results")

    p.add_argument("--num_fakes", type=int, default=10, help="Number of images to generate")
    p.add_argument("--ctrl_dim", type=int, default=-1, help="control dimension")
    p.add_argument("--num_videos", type=int, default=10, help="Number of videos to generate")

    p.add_argument("--save_interval", type=int, default=5000, help="save interval")
    p.add_argument("--print_interval", type=int, default=100, help="print interval")
    p.add_argument("--show_interval", type=int, default=1000,
                   help="interval of showing images in training")

    # --- TPU-native extensions ---
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   help="bfloat16 or float32 compute (params stay fp32)")
    p.add_argument("--seed", type=int, default=0, help="global PRNG seed")
    p.add_argument("--inception_weights", type=str, default="",
                   help="path to pytorch-fid pt_inception .pth for FID eval")
    p.add_argument("--remat_blocks", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="rematerialize G/D blocks in backward (--no-remat_blocks to disable)")
    p.add_argument("--num_data_workers", type=int, default=4, help="host data worker threads")
    p.add_argument("--profile_dir", type=str, default="", help="jax.profiler trace output dir")
    return p


def parse_config(argv=None) -> Config:
    args = build_parser().parse_args(argv)
    fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(args).items() if k in fields})
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

    # multi-host TPU slices: initialize the distributed runtime when a
    # coordinator is configured (single-host runs skip this)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    cfg = parse_config(argv)
    print(cfg)
    from lcgan_tpu.train.loop import run_phase

    run_phase(cfg)


if __name__ == "__main__":
    main()
