"""Model registry (ref: sarathi-lean models/__init__.py).

llama/yi/mistral/qwen/internlm share the Llama-family TPU body (their
reference files differ only in bias/rope/window details captured by
ModelArch flags); falcon gets its own parallel-attention body.  Each
family still has its own module documenting the mapping.
"""

from __future__ import annotations

from vattention_tpu.model_executor.models.llama import LlamaForCausalLM


def get_model_class(model_type: str):
    from vattention_tpu.model_executor.models.falcon import FalconForCausalLM
    from vattention_tpu.model_executor.models.internlm import (
        InternLMForCausalLM)
    from vattention_tpu.model_executor.models.mistral import (
        MistralForCausalLM)
    from vattention_tpu.model_executor.models.qwen import (
        Qwen2ForCausalLM, QwenForCausalLM)
    from vattention_tpu.model_executor.models.yi import YiForCausalLM

    registry = {
        "llama": LlamaForCausalLM,
        "yi": YiForCausalLM,
        "mistral": MistralForCausalLM,
        "qwen": QwenForCausalLM,
        "qwen2": Qwen2ForCausalLM,
        "internlm": InternLMForCausalLM,
        "opt": LlamaForCausalLM,
        "falcon": FalconForCausalLM,
    }
    if model_type not in registry:
        raise ValueError(f"unsupported model type {model_type!r}")
    return registry[model_type]
