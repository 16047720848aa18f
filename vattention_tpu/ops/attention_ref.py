"""Pure-jnp reference attention for kernel validation.

Plays the role stock FlashAttention plays in the reference's kernel tests
(pod_attn/tests/*: torch.allclose against FA with atol 1e-3); here the
Pallas kernels are validated against these definitions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mha_reference(q, k, v, *, causal: bool, q_start: int = 0,
                  sm_scale: float | None = None):
    """q: [Tq, Hq, D]; k/v: [Tk, Hkv, D] (GQA: Hq = G*Hkv).

    ``q_start``: absolute position of q[0] (causal masking for chunked
    prefill: q token i is at position q_start + i).
    """
    Tq, Hq, D = q.shape
    Tk, Hkv, _ = k.shape
    G = Hq // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    qf = q.astype(jnp.float32).reshape(Tq, Hkv, G, D)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # [Hkv, G, Tq, Tk]
    scores = jnp.einsum("qhgd,khd->hgqk", qf, kf) * sm_scale
    if causal:
        q_pos = q_start + jnp.arange(Tq)[:, None]
        k_pos = jnp.arange(Tk)[None, :]
        mask = q_pos >= k_pos
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgqk,khd->qhgd", p, vf)
    return out.reshape(Tq, Hq, D)


def decode_reference(q, k_cache, v_cache, seqlens, *, sm_scale=None):
    """q: [B, Hq, D]; caches: [B, R, Hkv, D] (already gathered per seq);
    seqlens: [B]. Each q attends rows [0, seqlens[b])."""
    B, Hq, D = q.shape
    _, R, Hkv, _ = k_cache.shape
    G = Hq // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    qf = q.astype(jnp.float32).reshape(B, Hkv, G, D)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("bhgd,bkhd->bhgk", qf, kf) * sm_scale
    mask = jnp.arange(R)[None, :] < seqlens[:, None]  # [B, R]
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    p = jnp.where(jnp.isnan(p), 0.0, p)  # fully-masked rows (seqlen 0)
    out = jnp.einsum("bhgk,bkhd->bhgd", p, vf)
    return out.reshape(B, Hq, D)
