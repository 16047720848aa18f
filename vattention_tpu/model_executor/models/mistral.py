"""Mistral-7B.

ref: sarathi-lean/sarathi/model_executor/models/mistral.py (461 LoC).
Llama body + sliding-window attention (window=4096).  The window is
arch data (``ModelArch.sliding_window``); the vattn/paged/pod attention
backends apply it as a lower bound on the causal mask inside the Pallas
kernels (ops/flash_prefill.py, ops/flash_decode.py), which also lets the
scheduler cap KV growth at the window.
"""

from __future__ import annotations

from vattention_tpu.model_executor.models.llama import LlamaForCausalLM


class MistralForCausalLM(LlamaForCausalLM):
    """Llama body; sliding window comes from ModelArch and is enforced
    in the attention kernels' masks."""
