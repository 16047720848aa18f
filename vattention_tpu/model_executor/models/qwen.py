"""Qwen / Qwen2.

ref: sarathi-lean/sarathi/model_executor/models/qwen.py (394 LoC).
Llama body + bias on the qkv projection (``ModelArch.qkv_bias``,
set for model_type "qwen"/"qwen2" in config.get_model_arch).
"""

from __future__ import annotations

from vattention_tpu.model_executor.models.llama import LlamaForCausalLM


class QwenForCausalLM(LlamaForCausalLM):
    """Llama body; qkv bias handled by ModelArch.qkv_bias."""


class Qwen2ForCausalLM(QwenForCausalLM):
    pass
