"""Generator EMA (ema.py:4-32) as a pure tree lerp.

Semantics: ``p_ema = p.lerp(p_ema, decay)`` == ``(1-decay)·p + decay·p_ema``
over params AND buffers (the w-avg stats). Decay is 0.0 before
``g_ema_start`` (i.e. a plain copy, ema.py:19-23). The reference's special
case for ``num_batches_tracked`` buffers has no analogue here (no BN).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def ema_update(
    params: Any,
    stats: Any,
    ema_params: Any,
    ema_stats: Any,
    step: jax.Array,
    decay: float,
    start_iter: int,
) -> Tuple[Any, Any]:
    d = jnp.where(step < start_iter, 0.0, decay).astype(jnp.float32)

    def lerp(p, e):
        return (p + d * (e.astype(p.dtype) - p)).astype(e.dtype)

    return (
        jax.tree.map(lerp, params, ema_params),
        jax.tree.map(lerp, stats, ema_stats),
    )
