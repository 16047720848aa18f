"""Yi models (Yi-6B-200K, Yi-34B-200K).

ref: sarathi-lean/sarathi/model_executor/models/yi.py (458 LoC).  Yi is
the Llama body with GQA (4/8 kv heads), rope_theta=5e6 and 200K context
(the reference file differs from llama.py only in weight-name aliases
ln1/ln2 and rope applied at yi.py:173).  Here the differences are pure
data -- captured by ``ModelArch`` ("yi-6b-200k", "yi-34b-200k" in
config.py) -- so the class is the shared TPU body bound to that arch.
"""

from __future__ import annotations

from vattention_tpu.model_executor.models.llama import LlamaForCausalLM


class YiForCausalLM(LlamaForCausalLM):
    """Llama body; Yi specifics (GQA ratio, theta, 200K ctx) live in
    ModelArch.  Weight aliases (ln1/ln2 -> input/post_attention_layernorm)
    are normalized in weight_utils.load_safetensors."""
