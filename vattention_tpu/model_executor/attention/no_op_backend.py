"""NO_OP attention backend: skip KV writes and attention entirely.

ref: sarathi-lean no_op_attention_wrapper.py (45 LoC) -- used to profile
the non-attention portion of the model (linear layers, collectives,
norms) in isolation.  ``attend`` returns the query unchanged and
``append_kv`` leaves the arena untouched, so a NO_OP run measures
everything *except* the attention/cache path.
"""

from __future__ import annotations


class NoOpAttentionBackend:
    def __init__(self, **_kwargs):
        self.sliding_window = None

    def append_kv(self, kv_cache, k, v, inputs, layer_idx,
                  n_prefill_tokens: int = 0):
        return kv_cache

    def attend(self, q, kv_cache, inputs, layer_idx,
               n_prefill_tokens: int, *, sm_scale: float,
               kv_len_hint=None):
        return q
