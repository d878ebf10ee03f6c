"""Fresh-process resume half of the bit-exact resume test.

Restores the checkpoint saved by the parent (after N epochs), trains M more
epochs on the same deterministic fake-batch sequence, and saves the final
TrainState to ``<run>/model_resumed``. The parent compares it bitwise to an
uninterrupted N+M run. A separate process is the point: nothing may depend
on live Python objects that only the saving process had (the reference's
resume drops optimizer+RNG state entirely, worker.py:239-253 — this
framework claims better, so it must prove it cold).

Usage: python resume_worker.py <model_name> <start_epoch> <end_epoch>
"""

import os
import sys

_tests_dir = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _tests_dir)
sys.path.insert(0, os.path.dirname(_tests_dir))  # repo root for lcgan_tpu

# Same backend dance as conftest.py: this environment pre-registers the
# experimental axon TPU platform, so the env var alone is not enough.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from test_train import fake_batch, tiny_cfg  # noqa: E402


def main(model_name: str, start_epoch: int, end_epoch: int) -> None:
    import os

    from lcgan_tpu.train.steps import Trainer
    from lcgan_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_cfg(model_name=model_name)
    trainer = Trainer(cfg)
    template = trainer.init_state()
    model_dir = cfg.run_dirs()["model"]
    state = CheckpointManager(model_dir).restore(template)
    for epoch in range(start_epoch, end_epoch):
        state, _, _ = trainer.train_iteration(state, fake_batch(cfg, cfg.batch_size, seed=epoch), epoch)
    CheckpointManager(os.path.join(os.path.dirname(model_dir), "model_resumed")).save(state)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
