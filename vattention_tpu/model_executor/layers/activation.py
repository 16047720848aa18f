"""Activations (ref: sarathi-lean layers/activation.py:61 -> csrc
silu_and_mul).  Pure jnp; XLA fuses into the surrounding matmuls."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(x: jnp.ndarray) -> jnp.ndarray:
    """x: [..., 2*I] -> silu(x[..., :I]) * x[..., I:]."""
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)
