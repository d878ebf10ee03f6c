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


def process_barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Cross-process fence over the coordination service (DCN).

    The TPU-native analogue of the reference's ``dist.barrier`` fences around
    rank-0 I/O (loader.py:42,68,73,80,89,98,104). Device collectives are the
    wrong tool here: a non-zero process that races ahead into the next
    compiled collective while process 0 renders artifacts can time out the
    collective transport's rendezvous (gloo's key exchange is hard-capped at
    30s), whereas the coordination-service barrier tolerates minutes of skew.
    No-op when single-process. ``name`` must be unique per fence point (the
    callers thread the epoch/phase into it).
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:  # initialize() not called — single-process runtime
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard leading (batch) dim across the data axis."""
    return jax.device_put(batch, NamedSharding(mesh, P("data")))


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.device_put(tree, NamedSharding(mesh, P()))
