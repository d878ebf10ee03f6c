"""Run configuration.

Mirrors the 33 CLI flags of the reference (``main.py:12-61``) with identical
names, defaults, and semantics, plus TPU-native extensions (compute dtype,
mesh shape, deterministic seeds). Serialized to ``<model_name>/args.txt``
like the reference (``loader.py:27-28``) and reloadable (an improvement —
the reference never reloads it, ``SURVEY.md §5``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass
class Config:
    # --- phase control (main.py:16-17) ---
    phase: str = "train"  # train | fid_eval | fake_image_generation | video_generation
    best: bool = False

    # --- loss weights (main.py:19-23) ---
    tau: float = 0.05
    l_adv: float = 1.0
    l_aux: float = 0.5
    l_r1: float = 10.0
    l_s: float = 1e-7

    # --- latent geometry (main.py:25-31) ---
    max_flow_scale: float = 0.1
    geo_noise_dim: int = 64
    app_noise_dim: int = 64
    geo_projection_dim: int = 256
    app_projection_dim: int = 256
    geo_latent_dim: int = 64
    app_latent_dim: int = 512

    # --- schedule (main.py:33-42) ---
    epoch: int = 100000  # per the reference, an "epoch" is one iteration
    batch_size: int = 32  # global batch, split across data-parallel devices
    g_lr: float = 0.002
    d_lr: float = 0.002
    beta1: float = 0.0
    beta2: float = 0.99
    g_ema_decay: float = 0.9999
    g_ema_start: int = 0
    freezeD_start: int = 100000
    freezeD_layer: int = 5

    # --- image / truncation (main.py:44-47) ---
    img_resolution: int = 256
    img_ch: int = 3
    psi: float = 2.0
    w_psi: float = 1.0

    # --- paths (main.py:49-52) ---
    dataset_path: str = "./"
    model_name: str = ""
    save_dir: str = "model"
    sample_dir: str = "samples"

    # --- generation (main.py:54-56) ---
    num_fakes: int = 10
    ctrl_dim: int = -1
    num_videos: int = 10

    # --- intervals (main.py:58-60) ---
    save_interval: int = 5000
    print_interval: int = 100
    show_interval: int = 1000

    # --- TPU-native extensions (not in reference) ---
    compute_dtype: str = "bfloat16"  # conv/matmul compute dtype; params stay fp32
    seed: int = 0
    base_nf: Optional[int] = None  # override channel base (tests / tiny models)
    max_nf: int = 512
    mbstd_group_size: int = 8  # cnn.py:28
    num_data_workers: int = 4  # worker.py:37
    inception_weights: str = ""  # path to pytorch-fid .pth for FID eval
    adam_eps: float = 1e-8  # worker.py:100
    # Rematerialize G/D blocks in backward passes. Default ON: the train
    # iteration holds up to 9 model applications live (3 G + 6 D on even
    # iters, worker.py:137-214); without remat their activations exceed a
    # v5e's 16G HBM at 256² batch 32. Costs ~1/3 extra forward FLOPs.
    remat_blocks: bool = True
    # With remat on, additionally save each G block's three modulated-conv
    # OUTPUTS (named "g_conv_out" checkpoints) so the remat backward drops the
    # conv forwards from the recompute — every residual downstream of a conv
    # rebuilds with cheap elementwise work from the saved result (see
    # models/generator.py). Costs ~2 block-sized tensors per block of HBM.
    # Only blocks with output maps <= remat_save_max_res use the policy.
    # Default 1024 = every flagship block: the r4 step-breakdown A/B measured
    # −6% D grad/R1 at 1024² from raising 512→1024 with G unchanged, and the
    # r5 full-step memory check PASSED at 1024²/b2 on a 16G v5e (10 warm +
    # 8 timed full iterations, all three variants, 1.97 imgs/sec — above the
    # 1.83 ledger; the r3 compile-blowup fear did not reproduce, r4 notes).
    remat_save_g_convs: bool = True
    remat_save_max_res: int = 1024
    # Same policy for the D trunk ("d_conv_out" on each block's two convs,
    # models/discriminator.py). D appears under grad up to 7× per even
    # iteration (3 in the G step + 4 in the D step, worker.py:137-214), so
    # skipping the conv recompute is multiplied; gated per block to input
    # maps <= remat_save_max_res like the G policy. Default ON: the r4
    # on-device A/B (tools/step_breakdown_probe @512²/b4, v5e) measured
    # D grad 63.8→55.1 ms (−13.6%) and R1 grad 124.5→113.7 ms (−8.7%)
    # with G fwd/grad unchanged (DESIGN.md round-4 notes).
    remat_save_d_convs: bool = True
    profile_dir: str = ""  # if set, jax.profiler traces are written here
    # jax.distributed.initialize policy: "auto" initializes when a coordinator
    # or Cloud TPU pod environment is detected, "on" forces it (multi-host
    # launches whose environment auto-detection misses), "off" never.
    distributed: str = "auto"
    # Bicubic-warp backend: "pallas" = fused TPU kernel (ops/warp_pallas.py),
    # "banded" = XLA scan form, "auto" = pallas on TPU backends, banded
    # elsewhere (CPU tests/dryrun can't run Mosaic kernels).
    warp_impl: str = "auto"
    # Below this map size the banded scan is already cheap and the fused
    # kernel's DMA/dispatch/transpose overheads dominate (measured: fused
    # loses at <=64², wins 1.9x at 128², tools/warp_blocks_probe.py).
    warp_pallas_min_res: int = 128
    warp_adaptive_band: bool = True
    # Batch the even-iteration views through single G/D applications
    # (3 G applies -> 1 at 3B; the D-step's 4 applies -> 1 at 4B) instead of
    # the reference's separate per-view calls. Numerically exact: mbstd gets
    # per-view statistics (ops/mbstd.py) and the w-avg update replays the
    # per-view sequential lerps (models/generator.py). Measured on the v5e at
    # 256²/b8: a slight LOSS (even step 16.2 vs 17.2 imgs/sec) — conv matmul
    # M-dims are already B·H·W, so there is no MXU fill to win, and the 3B
    # remat blocks schedule worse. Default off; kept as a tested alternative
    # formulation for small-map/large-batch regimes.
    view_batched_steps: bool = False

    # ------------------------------------------------------------------
    @property
    def resolved_base_nf(self) -> int:
        """Channel base per resolution (cnn.py:17, cnn.py:54)."""
        if self.base_nf is not None:
            return self.base_nf
        return 32 if self.img_resolution == 1024 else 64 if self.img_resolution == 512 else 128

    @property
    def num_blocks(self) -> int:
        """log2(resolution) - 2, 4×4 base (cnn.py:13, cnn.py:52)."""
        import math

        return int(math.log2(self.img_resolution)) - 2

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    # ------------------------------------------------------------------
    def run_dirs(self) -> dict:
        """Run-directory layout matching check_args (main.py:70-95)."""
        return {
            "root": self.model_name,
            "model": os.path.join(self.model_name, self.save_dir),
            "samples": os.path.join(self.model_name, self.sample_dir),
            "fakes": os.path.join(self.model_name, "fakes"),
            "demo": os.path.join(self.model_name, "demo"),
        }

    def make_run_dirs(self):
        d = self.run_dirs()
        for key in ("root", "model", "samples"):
            os.makedirs(d[key], exist_ok=True)

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})

    PHASES = ("train", "fid_eval", "fake_image_generation", "video_generation")

    def validate(self):
        if self.phase not in self.PHASES:
            raise ValueError(f"unknown phase {self.phase!r}; expected one of {self.PHASES}")
        if not self.model_name:
            raise ValueError("model name must be given")  # main.py:73-75
        if self.epoch < 1:
            raise ValueError("number of epochs must be >= 1")  # main.py:84-87
        if self.batch_size < 1:
            raise ValueError("batch size must be >= 1")  # main.py:90-93
        res = self.img_resolution
        if res < 8 or (res & (res - 1)) != 0:
            raise ValueError(f"img_resolution must be a power of two >= 8, got {res}")
        # guards hand-edited / resumed config JSON, not just argparse choices;
        # 'none' skips the warp entirely — diagnostic ablations only
        if self.warp_impl not in ("auto", "pallas", "banded", "none"):
            raise ValueError(
                f"warp_impl must be one of auto|pallas|banded|none, got {self.warp_impl!r}"
            )
        if self.compute_dtype not in ("bfloat16", "float32"):
            # fail at validation, not at the first cfg.dtype access deep in
            # the model build (where a 'bf16' typo surfaces as a numpy error)
            raise ValueError(
                f"compute_dtype must be bfloat16 or float32, got {self.compute_dtype!r}"
            )
        for name in ("save_interval", "print_interval", "show_interval"):
            if getattr(self, name) < 1:
                raise ValueError(f"{name} must be >= 1 (the train loop takes `step % {name}`)")
        if self.distributed not in ("auto", "on", "off"):
            raise ValueError(f"distributed must be auto|on|off, got {self.distributed!r}")
