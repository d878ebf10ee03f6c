"""End-to-end smoke: the CPU-runnable driver config — a few train steps on a
tiny synthetic dataset, then fake_image_generation (SURVEY.md §4 integration
test; BASELINE.json config 1)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from lcgan_tpu.cli import parse_config


@pytest.fixture
def tiny_run(tmp_path):
    # synthetic dataset
    root = tmp_path / "ds" / "train" / "x"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
            root / f"{i}.png"
        )
    return tmp_path


def _tiny_args(tmp_path, phase, epochs=2):
    return [
        "--phase", phase,
        "--model_name", str(tmp_path / "run"),
        "--dataset_path", str(tmp_path / "ds"),
        "--img_resolution", "16",
        "--batch_size", "8",
        "--epoch", str(epochs),
        "--geo_noise_dim", "8",
        "--app_noise_dim", "8",
        "--geo_latent_dim", "8",
        "--app_latent_dim", "16",
        "--geo_projection_dim", "8",
        "--app_projection_dim", "8",
        "--num_fakes", "2",
        "--save_interval", "2",
        "--print_interval", "1",
        "--show_interval", "1000000",
        "--compute_dtype", "float32",
        "--num_data_workers", "1",
    ]


def test_cli_parses_reference_flags(tmp_path):
    cfg = parse_config(_tiny_args(tmp_path, "train"))
    assert cfg.phase == "train"
    assert cfg.batch_size == 8
    assert cfg.tau == 0.05 and cfg.l_r1 == 10.0 and cfg.l_s == 1e-7


def test_eval_phases_reload_args_txt(tmp_path):
    """Eval/generation phases pick model geometry up from the run's args.txt
    (the reference dumps args.txt but never reloads it — README.md:61-63
    makes the user retype --img_resolution); explicitly typed flags win."""
    from lcgan_tpu.config import Config

    cfg = parse_config(_tiny_args(tmp_path, "train"))
    cfg.img_resolution = 32
    cfg.base_nf = 8
    cfg.make_run_dirs()
    cfg.dump(os.path.join(cfg.model_name, "args.txt"))

    # bare eval invocation: geometry comes from args.txt, not the defaults
    cfg_f = parse_config(["--phase", "fid_eval", "--model_name", cfg.model_name])
    assert cfg_f.phase == "fid_eval"
    assert cfg_f.img_resolution == 32
    assert cfg_f.base_nf == 8
    assert cfg_f.geo_noise_dim == 8  # from _tiny_args via args.txt

    # an explicitly typed flag overrides the reloaded value
    cfg_n = parse_config(
        ["--phase", "fake_image_generation", "--model_name", cfg.model_name,
         "--num_fakes", "7"]
    )
    assert cfg_n.num_fakes == 7 and cfg_n.img_resolution == 32

    # the train phase never reloads (a fresh run must honor the command line)
    cfg_t = parse_config(
        ["--phase", "train", "--model_name", cfg.model_name, "--epoch", "5"]
    )
    assert cfg_t.img_resolution == Config.img_resolution == 256


@pytest.mark.slow
def test_train_then_generate(tiny_run, monkeypatch):
    from lcgan_tpu.config import Config
    from lcgan_tpu.train.loop import run_phase

    # tiny nets for CPU speed
    def small(argv_phase, epochs=2):
        cfg = parse_config(_tiny_args(tiny_run, argv_phase, epochs))
        cfg.base_nf = 8
        cfg.max_nf = 16
        cfg.mbstd_group_size = 2
        return cfg

    cfg = small("train")
    run_phase(cfg)

    run_dir = str(tiny_run / "run")
    assert os.path.exists(os.path.join(run_dir, "args.txt"))
    assert os.path.exists(os.path.join(run_dir, "log.txt"))
    assert os.path.exists(os.path.join(run_dir, "epoch.txt"))
    with open(os.path.join(run_dir, "log.txt")) as f:
        lines = f.read().strip().splitlines()
    assert lines and lines[0].startswith("epoch:0, elapsed:")
    with open(os.path.join(run_dir, "args.txt")) as f:
        assert json.load(f)["img_resolution"] == 16

    # resume path: epoch.txt exists -> restart from epoch+1, state restored
    cfg2 = small("train", epochs=3)
    run_phase(cfg2)

    # generation phase reads the checkpoint and writes jpgs
    cfg3 = small("fake_image_generation")
    run_phase(cfg3)
    fakes = os.listdir(os.path.join(run_dir, "fakes"))
    assert "0000_images.jpg" in fakes and "0001_images.jpg" in fakes


@pytest.mark.slow
def test_fid_eval_saves_best_checkpoint(tiny_run):
    from lcgan_tpu.train.loop import run_phase

    cfg = parse_config(_tiny_args(tiny_run, "train"))
    cfg.base_nf = 8
    cfg.max_nf = 16
    cfg.mbstd_group_size = 2
    run_phase(cfg)

    cfg_f = parse_config(_tiny_args(tiny_run, "fid_eval"))
    cfg_f.base_nf = 8
    cfg_f.max_nf = 16
    cfg_f.mbstd_group_size = 2
    fid1 = run_phase(cfg_f)
    run_dir = str(tiny_run / "run")
    assert os.path.exists(os.path.join(run_dir, "fid.txt"))
    assert os.path.exists(os.path.join(run_dir, "best_fid.txt"))
    assert os.path.isdir(os.path.join(run_dir, "model", "state_best"))
    with open(os.path.join(run_dir, "best_fid.txt")) as f:
        assert abs(float(f.read()) - fid1) < 1e-6
    # --best loads the best snapshot without error
    cfg_b = parse_config(_tiny_args(tiny_run, "fake_image_generation") + ["--best"])
    cfg_b.base_nf = 8
    cfg_b.max_nf = 16
    cfg_b.mbstd_group_size = 2
    run_phase(cfg_b)


@pytest.mark.slow
def test_monitor_renders_sweep_videos(tiny_run):
    from lcgan_tpu.gen.artifacts import monitor_current_result
    from lcgan_tpu.train.loop import build_trainer, load_or_init_state

    cfg = parse_config(_tiny_args(tiny_run, "train"))
    cfg.base_nf = 8
    cfg.max_nf = 16
    cfg.mbstd_group_size = 2
    cfg.make_run_dirs()
    trainer = build_trainer(cfg)
    state, _, _ = load_or_init_state(cfg, trainer)
    # images_per_output=geo_noise_dim mirrors the training loop's call
    # (reference loader.py:72 overrides the worker.py:255 default of 32):
    # exactly ONE sweep group per modality, never two half-groups.
    monitor_current_result(
        cfg, trainer, state, epoch=7, num_explore=2, num_clips=1,
        images_per_output=cfg.geo_noise_dim, nrow=4
    )
    samples = os.listdir(os.path.join(str(tiny_run / "run"), "samples"))
    assert any(f.startswith("geometry_7_0") for f in samples)
    assert any(f.startswith("appearance_7_0") for f in samples)
    assert not any(f.startswith(("geometry_7_1", "appearance_7_1")) for f in samples)


@pytest.mark.slow
def test_video_generation_phase(tiny_run):
    from lcgan_tpu.train.loop import run_phase

    cfg = parse_config(_tiny_args(tiny_run, "train"))
    cfg.base_nf = 8
    cfg.max_nf = 16
    cfg.mbstd_group_size = 2
    run_phase(cfg)

    cfg_v = parse_config(
        _tiny_args(tiny_run, "video_generation") + ["--ctrl_dim", "0", "--num_videos", "1"]
    )
    cfg_v.base_nf = 8
    cfg_v.max_nf = 16
    cfg_v.mbstd_group_size = 2
    run_phase(cfg_v)
    demo = os.listdir(os.path.join(str(tiny_run / "run"), "demo"))
    assert any(f.startswith("controlled_dim=0_0") for f in demo)
