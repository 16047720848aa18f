"""Model registry (ref: sarathi-lean models/__init__.py).

llama/yi/mistral/qwen/internlm all share the Llama-family body (the
reference's per-model files differ only in bias/rope details captured by
ModelArch flags); falcon gets its own parallel-attention body.
"""

from __future__ import annotations

from vattention_tpu.model_executor.models.llama import LlamaForCausalLM


def get_model_class(model_type: str):
    from vattention_tpu.model_executor.models.falcon import FalconForCausalLM

    registry = {
        "llama": LlamaForCausalLM,
        "yi": LlamaForCausalLM,
        "mistral": LlamaForCausalLM,
        "qwen": LlamaForCausalLM,
        "qwen2": LlamaForCausalLM,
        "internlm": LlamaForCausalLM,
        "opt": LlamaForCausalLM,
        "falcon": FalconForCausalLM,
    }
    if model_type not in registry:
        raise ValueError(f"unsupported model type {model_type!r}")
    return registry[model_type]
