"""Mapping network and projection heads (custom_layers.py:259-306).

The MappingNetwork is LC-GAN's "linearly controllable" mechanism: a learned
linear factor L = orthogonalize(tanh(basis)) @ diag(|d| + eps) applied to the
noise, followed by an MLP of equalized linears with NO activations — the
whole map stays linear in z (custom_layers.py:268-287). ``diagonal_params``
is the L1-sparsity target of the generator loss (worker.py:207-209).

TPU notes:
  * ``jnp.linalg.qr`` is differentiable; we sign-fix Q so that diag(R) > 0,
    removing the QR sign ambiguity that can flip basis vectors between steps
    (documented hazard, SURVEY.md §7). The column span — the only thing the
    loss sees through L — is unchanged up to sign, and signs are symmetric
    at init since the basis is learned from randn.
  * QR of a 64×64 / 512×512 matrix runs per step in fp32; it is O(m³) ≤
    1.3e8 flops — negligible next to the conv stack.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from lcgan_tpu.ops.equalized import EqualizedLinear

Dtype = Any


def _at_least_f32(x: jax.Array) -> jax.Array:
    """Upcast bf16/fp16 to fp32; leave fp32/fp64 untouched."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return x.astype(jnp.float32)
    return x


def orthogonalize(matrix: jax.Array) -> jax.Array:
    """Q of the reduced QR, sign-fixed so diag(R) >= 0 (custom_layers.py:274-276)."""
    q, r = jnp.linalg.qr(_at_least_f32(matrix))
    sign = jnp.sign(jnp.diagonal(r))
    sign = jnp.where(sign == 0, 1.0, sign)
    return q * sign[None, :]


class MappingNetwork(nn.Module):
    """Linear factor + activation-free equalized MLP (custom_layers.py:259-287)."""

    channels_list: Sequence[int]
    lr_mul: float = 0.01
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        m = self.channels_list[0]
        diagonal = self.param("diagonal_params", nn.initializers.normal(1.0), (m,))
        basis = self.param("basis_params", nn.initializers.normal(1.0), (m, m))

        d = jnp.abs(_at_least_f32(diagonal)) + self.eps
        b_ortho = orthogonalize(jnp.tanh(basis))
        l_factor = b_ortho * d[None, :]  # == B @ diag(d)
        # x = L z  (torch bmm with z as column vector) == z @ L^T
        zf = _at_least_f32(z)
        x = jnp.dot(zf, l_factor.T.astype(zf.dtype), precision=jax.lax.Precision.HIGHEST)
        # Mapping stays in >= fp32 even when the synthesis stack runs bf16.
        mlp_dtype = jnp.promote_types(jnp.float32, self.dtype)
        for idx in range(len(self.channels_list) - 1):
            x = EqualizedLinear(
                features=self.channels_list[idx + 1],
                lr_mul=self.lr_mul,
                dtype=mlp_dtype,
                name=f"mlp_{idx}",
            )(x)
        return x.astype(self.dtype)


class ProjectionHead(nn.Module):
    """Equalized-linear MLP with LeakyReLU(0.2) between hidden layers
    (custom_layers.py:290-306)."""

    channels_list: Sequence[int]
    lr_mul: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        num_layers = len(self.channels_list) - 1
        x = z
        for idx in range(num_layers):
            x = EqualizedLinear(
                features=self.channels_list[idx + 1],
                lr_mul=self.lr_mul,
                dtype=self.dtype,
                name=f"mlp_{idx}",
            )(x)
            if idx < num_layers - 1:
                x = jax.nn.leaky_relu(x, 0.2)
        return x
