"""freezeD parameter masking (worker.py:127-135, gate loader.py:52-53).

Reference semantics: after ``freezeD_start`` iterations, the first
``freezeD_layer + 2`` children of the discriminator's ``shared_model`` stop
receiving gradients. The ``+2`` offset covers the fromRGB 1×1 conv and its
(parameterless) LeakyReLU, so the effective frozen set is:

    from_rgb  +  block_0 .. block_{freezeD_layer-1}

Here that's a static boolean mask over the d_params pytree; the train step
zeroes the gradients AND the optimizer updates of frozen sub-trees, which
reproduces torch's "no grad ⇒ Adam skips the param" behavior exactly at the
parameter level (params never move once frozen).
"""

from __future__ import annotations

from typing import Any

import jax


def freeze_mask(d_params: Any, freezeD_layer: int) -> Any:
    """Pytree of bools, True == frozen."""
    frozen_keys = {"from_rgb"} | {f"block_{i}" for i in range(freezeD_layer)}

    def mark(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return top in frozen_keys

    return jax.tree_util.tree_map_with_path(mark, d_params)


def apply_mask(tree: Any, mask: Any) -> Any:
    """Zero leaves where mask is True."""
    return jax.tree.map(lambda x, m: x * 0 if m else x, tree, mask)
