"""Ablation timing: where does the even-iteration time go?

Times the even train iteration with (a) everything on, (b) the warp
replaced by identity, (c) box filters replaced by identity, (d) both off.
Uses monkeypatching — probe only, never in the real model.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import lcgan_tpu.models.generator as gen_mod
import lcgan_tpu.ops.filters as filt_mod
from lcgan_tpu.config import Config


def make_iter(label):
    # fresh Trainer each time so flax re-traces with current monkeypatches
    from lcgan_tpu.train.steps import Trainer

    cfg = Config(
        model_name="/tmp/lcgan_abl", img_resolution=256, batch_size=8,
        compute_dtype="bfloat16", remat_blocks=True, freezeD_start=10**9,
    )
    tr = Trainer(cfg)
    st = tr.init_state()
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.uniform(-1, 1, (8, 256, 256, 3)).astype(np.float32))
    batch = {"image": mk(), "geometry_change": mk(), "appearance_change": mk()}
    st, g, d = tr.train_iteration(st, batch, 0)
    float(g)
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        st, g, d = tr.train_iteration(st, batch, 0)
    float(g)
    print(f"{label:28s} {(time.perf_counter() - t0) / n * 1000:9.1f} ms/even-iter")


def main():
    print(f"devices: {jax.devices()}")
    orig_warp = gen_mod.grid_sample_bicubic_banded
    orig_box = filt_mod.box_filter_3x3
    orig_box_gen = gen_mod.box_filter_3x3

    make_iter("full")

    gen_mod.grid_sample_bicubic_banded = lambda x, g, m: x
    make_iter("warp=identity")

    gen_mod.grid_sample_bicubic_banded = orig_warp
    filt_mod.box_filter_3x3 = lambda x: x
    gen_mod.box_filter_3x3 = lambda x: x
    import lcgan_tpu.models.discriminator as disc_mod

    orig_box_disc = disc_mod.box_filter_3x3
    disc_mod.box_filter_3x3 = lambda x: x
    make_iter("boxfilter=identity")

    gen_mod.grid_sample_bicubic_banded = lambda x, g, m: x
    make_iter("warp+box=identity")

    gen_mod.grid_sample_bicubic_banded = orig_warp
    filt_mod.box_filter_3x3 = orig_box
    gen_mod.box_filter_3x3 = orig_box_gen
    disc_mod.box_filter_3x3 = orig_box_disc


if __name__ == "__main__":
    main()
