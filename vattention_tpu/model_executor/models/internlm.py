"""InternLM-20B.

ref: sarathi-lean/sarathi/model_executor/models/internlm.py (332 LoC).
Llama body + optional attention bias (``ModelArch.qkv_bias``, set for
model_type "internlm" in config.get_model_arch).
"""

from __future__ import annotations

from vattention_tpu.model_executor.models.llama import LlamaForCausalLM


class InternLMForCausalLM(LlamaForCausalLM):
    """Llama body; attention bias handled by ModelArch.qkv_bias."""
