"""Weight loading (ref: sarathi-lean model_executor/weight_utils.py:134-282).

Formats: "dummy" (random init, the reference's benchmark default) and
"safetensors" (local HF checkpoint dir, TP-sharded slicing at load time).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from vattention_tpu.config import ModelConfig
from vattention_tpu.logger import init_logger

logger = init_logger(__name__)


def load_weights(model, model_config: ModelConfig, *, seed: int = 0,
                 tp_rank: int = 0) -> Dict[str, Any]:
    if model_config.load_format == "dummy":
        return model.init_params(np.random.default_rng(seed))
    if model_config.load_format == "zero":
        # instant init for perf benchmarks (values never matter there)
        return model.init_params(np.random.default_rng(seed), zero=True)
    if model_config.load_format == "safetensors":
        return load_safetensors(model, model_config, tp_rank=tp_rank)
    raise ValueError(f"unknown load_format {model_config.load_format!r}")


# HF parameter name -> (our layer key, transpose?) for llama-family
_HF_LAYER_MAP = {
    "input_layernorm.weight": ("input_norm", False),
    "post_attention_layernorm.weight": ("post_norm", False),
    "self_attn.o_proj.weight": ("o_w", True),
    "mlp.down_proj.weight": ("down_w", True),
}


def load_safetensors(model, model_config: ModelConfig, *,
                     tp_rank: int = 0) -> Dict[str, Any]:
    """Load + TP-shard a local HF llama-family safetensors checkpoint.

    ref weight_utils.py load_tensor_parallel_weights:238+ -- column
    weights (q/k/v, gate/up) sliced on the output axis, row weights
    (o, down) on the input axis.
    """
    from safetensors import safe_open

    if model.arch.model_type == "falcon":
        return load_safetensors_falcon(model, model_config)
    a = model.arch
    tp = model.tp_size
    D = a.head_dim
    params = model.init_params(np.random.default_rng(0))
    files = sorted(glob.glob(os.path.join(model_config.model,
                                          "*.safetensors")))
    assert files, f"no safetensors under {model_config.model}"
    raw: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                raw[name] = sf.get_tensor(name)

    def shard_col(w, n_heads_total):
        """w: [out, in] HF layout; slice out-axis for this tp rank."""
        per = w.shape[0] // tp
        return w[tp_rank * per:(tp_rank + 1) * per]

    def shard_row(w):
        per = w.shape[1] // tp
        return w[:, tp_rank * per:(tp_rank + 1) * per]

    dtype = model.dtype
    L = a.num_layers
    lp = params["layers"]

    def put(dst, l, value):
        lp[dst] = lp[dst].at[l].set(jnp.asarray(value, dtype=dtype))

    for l in range(L):
        pfx = f"model.layers.{l}."
        q = shard_col(raw[pfx + "self_attn.q_proj.weight"], a.num_q_heads)
        k = shard_col(raw[pfx + "self_attn.k_proj.weight"], a.num_kv_heads)
        v = shard_col(raw[pfx + "self_attn.v_proj.weight"], a.num_kv_heads)
        put("qkv_w", l, np.concatenate([q, k, v], axis=0).T)
        if "qkv_b" in lp:
            qb = shard_col(raw[pfx + "self_attn.q_proj.bias"][:, None],
                           a.num_q_heads)[:, 0]
            kb = shard_col(raw[pfx + "self_attn.k_proj.bias"][:, None],
                           a.num_kv_heads)[:, 0]
            vb = shard_col(raw[pfx + "self_attn.v_proj.bias"][:, None],
                           a.num_kv_heads)[:, 0]
            put("qkv_b", l, np.concatenate([qb, kb, vb]))
        put("o_w", l, shard_row(raw[pfx + "self_attn.o_proj.weight"]).T)
        gate = shard_col(raw[pfx + "mlp.gate_proj.weight"], 0)
        up = shard_col(raw[pfx + "mlp.up_proj.weight"], 0)
        put("gate_up_w", l, np.concatenate([gate, up], axis=0).T)
        put("down_w", l, shard_row(raw[pfx + "mlp.down_proj.weight"]).T)
        put("input_norm", l, raw[pfx + "input_layernorm.weight"])
        put("post_norm", l, raw[pfx + "post_attention_layernorm.weight"])

    params["layers"] = lp
    params["embed"] = jnp.asarray(raw["model.embed_tokens.weight"],
                                  dtype=dtype)
    params["final_norm"] = jnp.asarray(raw["model.norm.weight"], dtype=dtype)
    if not a.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(raw["lm_head.weight"].T, dtype=dtype)
    logger.info("loaded %d safetensors tensors from %s", len(raw),
                model_config.model)
    return params


def load_safetensors_falcon(model, model_config: ModelConfig
                            ) -> Dict[str, Any]:
    """Falcon-7B-layout checkpoint (``transformer.h.{l}.*``; fused MQA
    query_key_value with KV rows at the end; parallel-attn single
    layernorm).  ref: sarathi-lean models/falcon.py weight loading."""
    from safetensors import safe_open

    assert model.tp_size == 1, (
        "falcon safetensors loading supports tp=1 (MQA kv is shared)")
    a = model.arch
    params = model.init_params(np.random.default_rng(0))
    files = sorted(glob.glob(os.path.join(model_config.model,
                                          "*.safetensors")))
    assert files, f"no safetensors under {model_config.model}"
    raw: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                raw[name] = sf.get_tensor(name)

    dtype = model.dtype
    lp = params["layers"]

    def put(dst, l, value):
        lp[dst] = lp[dst].at[l].set(jnp.asarray(value, dtype=dtype))

    for l in range(a.num_layers):
        pfx = f"transformer.h.{l}."
        put("qkv_w", l,
            raw[pfx + "self_attention.query_key_value.weight"].T)
        put("o_w", l, raw[pfx + "self_attention.dense.weight"].T)
        put("up_w", l, raw[pfx + "mlp.dense_h_to_4h.weight"].T)
        put("down_w", l, raw[pfx + "mlp.dense_4h_to_h.weight"].T)
        put("input_norm", l, raw[pfx + "input_layernorm.weight"])
        put("input_norm_b", l, raw[pfx + "input_layernorm.bias"])
    params["layers"] = lp
    params["embed"] = jnp.asarray(raw["transformer.word_embeddings.weight"],
                                  dtype=dtype)
    params["final_norm"] = jnp.asarray(raw["transformer.ln_f.weight"],
                                       dtype=dtype)
    params["final_norm_b"] = jnp.asarray(raw["transformer.ln_f.bias"],
                                         dtype=dtype)
    params["lm_head"] = jnp.asarray(
        raw.get("lm_head.weight",
                raw["transformer.word_embeddings.weight"]).T, dtype=dtype)
    logger.info("loaded %d falcon safetensors tensors from %s", len(raw),
                model_config.model)
    return params
