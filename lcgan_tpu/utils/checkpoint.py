"""Checkpoint / resume (worker.py:219-253, loader.py:36-42,75-80).

One Orbax snapshot of the full TrainState pytree (G, D, EMA, both Adam
states, w-avg stats, PRNG key, step) — strictly more than the reference's
three ``state_dict`` files, which drop optimizer and RNG state (SURVEY.md
§3.5). On-disk layout keeps the reference's run-dir contract:

    <model_name>/model/state/      latest snapshot (== gen/disc/ema ckpts)
    <model_name>/model/state_best/ best-FID snapshot (save_best_model — the
                                   reference defines it but never calls it,
                                   worker.py:229; fixed here per SURVEY §7)
    <model_name>/epoch.txt         resume sidecar (loader.py:36-42)
    <model_name>/args.txt          config dump (loader.py:27-28)
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from lcgan_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, model_dir: str):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, best: bool) -> str:
        return os.path.join(self.model_dir, "state_best" if best else "state")

    def save(self, state: TrainState, best: bool = False):
        path = self._path(best)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, target: TrainState, best: bool = False) -> TrainState:
        """Restore into the structure of ``target`` (an initialized state)."""
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckptr.restore(self._path(best), abstract)

    def exists(self, best: bool = False) -> bool:
        return os.path.isdir(self._path(best))


def read_epoch_file(model_name: str) -> Optional[int]:
    p = os.path.join(model_name, "epoch.txt")
    if os.path.exists(p):
        with open(p) as f:
            return int(f.read().strip())
    return None


def write_epoch_file(model_name: str, epoch: int):
    with open(os.path.join(model_name, "epoch.txt"), "w") as f:
        f.write(str(epoch))
