"""RMSNorm (ref: sarathi-lean layers/layernorm.py:40 -> csrc rms_norm).

Pure jnp: XLA fuses the reduction + scale into neighbouring ops; a
dedicated kernel buys nothing on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray,
             eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)
