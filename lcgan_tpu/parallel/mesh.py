"""Device mesh construction and sharding helpers.

The reference's distributed runtime is NCCL DDP with one process per GPU
(main.py:105-113, loader.py:13-19). The TPU-native equivalent is one process
per host owning all local devices, a 1-D ``data`` mesh, replicated
parameters, and batch sharding — XLA compiles the gradient ``pmean`` into
ICI all-reduces; there is no user-level comm backend (SURVEY.md §2.4).

Multi-host: call ``jax.distributed.initialize()`` before anything else (the
CLI does this when JAX_COORDINATOR_ADDRESS is set); the mesh then spans all
processes' devices and DP sync rides ICI intra-slice / DCN across slices.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), ("data",))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard leading (batch) dim across the data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, NamedSharding(mesh, P()))
