"""Minibatch standard-deviation layer (custom_layers.py:237-256).

NHWC port with identical grouping semantics: row-major reshape of the batch
into (G, N//G) means group g holds samples {g*(N//G) + m}. Under data
parallelism the group statistic is computed over the *per-device* batch,
matching the reference's DDP behavior (SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def minibatch_stddev(
    x: jax.Array, group_size: int = 8, num_channels: int = 1, num_views: int = 1
) -> jax.Array:
    """Append per-group feature stddev as extra channel(s). x: (N,H,W,C).

    ``num_views > 1``: N is ``num_views`` independent view-batches stacked
    along the batch axis; the statistic is computed within each view exactly
    as if the views were separate forward passes (the grouping reshape is
    strided, so naive concatenation would mix views). Lets the train step
    batch the reference's separate per-view D applications (worker.py:163-173)
    into one without changing a single value.
    """
    if num_views > 1:
        n = x.shape[0]
        assert n % num_views == 0, (n, num_views)
        xv = x.reshape((num_views, n // num_views) + x.shape[1:])
        out = jax.vmap(lambda v: minibatch_stddev(v, group_size, num_channels))(xv)
        return out.reshape((n,) + out.shape[2:])
    n, h, w, c = x.shape
    g = min(group_size, n)
    f = num_channels
    cg = c // f
    xf = x.astype(jnp.float32)
    # torch: x.reshape(G, -1, F, c, H, W) — batch split row-major into (G, N//G)
    y = xf.reshape(g, n // g, h, w, f, cg)
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)  # (N//G, H, W, F, cg)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))  # mean over H, W, cg -> (N//G, F)
    # broadcast back: repeat along batch (tile, matching torch y.repeat(G,1,H,W))
    y = jnp.tile(y[None], (g, 1, 1)).reshape(n, 1, 1, f)
    y = jnp.broadcast_to(y, (n, h, w, f)).astype(x.dtype)
    return jnp.concatenate([x, y], axis=-1)
