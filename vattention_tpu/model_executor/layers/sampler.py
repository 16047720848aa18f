"""Token sampler (ref: sarathi-lean layers/sampler.py:222).

Greedy + temperature/top-k/top-p sampling over the last-token logits of
each scheduled sequence, fully inside the jitted step (one program, no
host round-trip per token).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_tokens(
    logits: jnp.ndarray,       # [B, V] float32
    temperatures: jnp.ndarray,  # [B] (0 => greedy)
    top_p: jnp.ndarray,         # [B]
    top_k: jnp.ndarray,         # [B] int32 (-1 disables)
    rng: jax.Array,
) -> jnp.ndarray:
    B, V = logits.shape
    greedy = temperatures < 1e-5
    temps = jnp.where(greedy, 1.0, temperatures)
    scaled = logits / temps[:, None]

    def filter_topk_topp(scaled):
        # top-k mask: keep the k largest (ref sampler.py _apply_top_p_top_k)
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]  # descending
        k = jnp.where(top_k <= 0, V, top_k)
        kth = jnp.take_along_axis(
            sorted_logits, jnp.clip(k[:, None] - 1, 0, V - 1), axis=-1)
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

        # top-p (nucleus) mask over the sorted distribution
        sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        # keep tokens while cumulative prob (exclusive) < top_p
        cutoff_mask = (cum - sorted_probs) < top_p[:, None]
        # threshold logit: smallest kept logit
        thresh = jnp.min(jnp.where(cutoff_mask, sorted_logits, jnp.inf),
                         axis=-1, keepdims=True)
        return jnp.where(scaled < thresh, -jnp.inf, scaled)

    # the [B, V] sort is expensive on TPU; skip it at runtime unless some
    # non-greedy sequence actually restricts top-k/top-p this step
    need_filter = jnp.any(jnp.logical_and(
        jnp.logical_not(greedy),
        jnp.logical_or(jnp.logical_and(top_k > 0, top_k < V),
                       top_p < 1.0)))
    scaled = jax.lax.cond(need_filter, filter_topk_topp,
                          lambda s: s, scaled)

    sampled = jax.random.categorical(rng, scaled, axis=-1)
    argmax = jnp.argmax(logits, axis=-1)
    return jnp.where(greedy, argmax, sampled).astype(jnp.int32)
