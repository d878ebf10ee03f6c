"""Loss library (loss.py:9-34, worker.py:151-210).

All losses are pure functions designed to live inside one jitted train step.
R1 is a jax.grad-in-grad (the outer step differentiates through it), which
replaces the reference's double-backward ``autograd.grad(create_graph=True)``.
The reference's ``+ images[:,0,0,0].mean()*0`` DDP unused-parameter hack
(loss.py:23) is unnecessary in JAX and dropped (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def contrastive_loss(
    anchor: jax.Array, p_sample: jax.Array, n_sample: jax.Array, tau: float
) -> jax.Array:
    """Pairwise InfoNCE (loss.py:9-15).

    -log(e^{p/tau} / (e^{p/tau} + e^{n/tau})) == softplus((n - p)/tau),
    computed in the numerically stable softplus form.
    """
    anchor = anchor.astype(jnp.float32)
    p = jnp.sum(anchor * p_sample.astype(jnp.float32), axis=-1)
    n = jnp.sum(anchor * n_sample.astype(jnp.float32), axis=-1)
    return jnp.mean(jax.nn.softplus((n - p) / tau))


def bce_logits(logit: jax.Array, target: float) -> jax.Array:
    """binary_cross_entropy_with_logits against a constant 0/1 label."""
    logit = logit.astype(jnp.float32)
    if target == 1.0:
        return jnp.mean(jax.nn.softplus(-logit))
    if target == 0.0:
        return jnp.mean(jax.nn.softplus(logit))
    return jnp.mean(jax.nn.softplus(logit) - target * logit)


def r1_penalty_with_logits(
    logit_fn: Callable[[jax.Array], jax.Array], images: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """One forward: returns (logits, r1) using value_and_grad on the sum.

    Matches the reference flow where the real logits used for the adversarial
    term are the same tensor the R1 gradient is taken from (worker.py:152-160).
    """

    def summed(img):
        logits = logit_fn(img)
        return jnp.sum(logits.astype(jnp.float32)), logits

    (_, logits), grads = jax.value_and_grad(summed, has_aux=True)(images)
    grads = grads.astype(jnp.float32)
    batch = images.shape[0]
    r1 = 0.5 * jnp.mean(jnp.sum(jnp.square(grads.reshape(batch, -1)), axis=1))
    return logits, r1


def sparsity_loss(diagonal_params1: jax.Array, diagonal_params2: jax.Array) -> jax.Array:
    """L1 norm of both mapping nets' diagonal params (worker.py:207-209)."""
    cat = jnp.concatenate(
        [diagonal_params1.reshape(-1).astype(jnp.float32), diagonal_params2.reshape(-1).astype(jnp.float32)]
    )
    return jnp.sum(jnp.abs(cat))
