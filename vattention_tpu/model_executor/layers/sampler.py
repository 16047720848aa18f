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


def pack_samples(
    logits: jnp.ndarray,   # [B, V] float32 (pre-temperature)
    tokens: jnp.ndarray,   # [B] int32 sampled token ids (-1 = no sample)
    n_top: int = 0,
) -> jnp.ndarray:
    """Pack sampled tokens with their logprobs into ONE int32 array
    [B, 2 + 2*n_top]: col 0 token id, col 1 logprob f32 bits, cols
    2:2+n selects the top-n token ids, 2+n:2+2n their logprob bits.

    One packed array means one device->host fetch per step -- through a
    remote-dispatch tunnel each extra fetched array costs ~2ms, so
    tokens and logprobs must not travel separately.  Logprobs are over
    the raw logits (the OpenAI convention: pre-temperature
    distribution), computed with one logsumexp -- ~V flops/row next to
    the lm-head's H*V matmul.  ref: sarathi-lean samples logprobs via
    torch.log_softmax in its sampler (layers/sampler.py)."""
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    tok = jnp.clip(tokens, 0, logits.shape[-1] - 1)
    lp = (jnp.take_along_axis(
        logits.astype(jnp.float32), tok[:, None], axis=-1)[:, 0] - lse)
    parts = [tokens[:, None],
             jax.lax.bitcast_convert_type(lp, jnp.int32)[:, None]]
    if n_top > 0:
        top_vals, top_ids = jax.lax.top_k(
            logits.astype(jnp.float32), n_top)
        top_lps = top_vals - lse[:, None]
        parts += [top_ids.astype(jnp.int32),
                  jax.lax.bitcast_convert_type(top_lps, jnp.int32)]
    return jnp.concatenate(parts, axis=1)


def unpack_samples(samples, n_top: int = 0):
    """Host-side inverse of pack_samples: (tokens [B], logprobs [B],
    top_ids [B, n], top_lps [B, n]) as numpy arrays."""
    import numpy as np

    samples = np.asarray(samples)
    tokens = samples[:, 0]
    lps = samples[:, 1].view(np.float32)
    if n_top > 0:
        top_ids = samples[:, 2:2 + n_top]
        top_lps = samples[:, 2 + n_top:2 + 2 * n_top].view(np.float32)
    else:
        top_ids = top_lps = None
    return tokens, lps, top_ids, top_lps
