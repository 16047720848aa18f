"""Partition specs for model weights and KV arenas.

ref: sarathi-lean parallel_utils/tensor_parallel/layers.py:72,182,315 --
VocabParallelEmbedding / ColumnParallelLinear / RowParallelLinear.  The
same Megatron layout expressed as PartitionSpecs consumed by shard_map:
qkv and gate_up split on the output (head/ffn) axis, o and down on the
input axis (followed by a psum inside the model), the KV arena on the
kv-head axis.  Layer-stacked weights additionally shard the leading [L]
axis over "pp" when pipelining.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def llama_param_specs(tp_axis: Optional[str] = "tp",
                      pp_axis: Optional[str] = None,
                      qkv_bias: bool = False,
                      tie_word_embeddings: bool = False):
    """Pytree of PartitionSpecs matching LlamaForCausalLM.init_params."""
    lp = {
        "input_norm": P(pp_axis),
        "post_norm": P(pp_axis),
        "qkv_w": P(pp_axis, None, tp_axis),
        "o_w": P(pp_axis, tp_axis, None),
        "gate_up_w": P(pp_axis, None, tp_axis),
        "down_w": P(pp_axis, tp_axis, None),
    }
    if qkv_bias:
        lp["qkv_b"] = P(pp_axis, tp_axis)
    specs = {
        "embed": P(),       # replicated (vocab-parallel is a follow-up)
        "final_norm": P(),
        "layers": lp,
    }
    if not tie_word_embeddings:
        specs["lm_head"] = P()
    return specs


def kv_cache_spec(tp_axis: Optional[str] = "tp",
                  pp_axis: Optional[str] = None):
    """[L, 2, Hkv, R, D] -> layers over pp, kv heads over tp."""
    return P(pp_axis, None, tp_axis, None, None)


def regroup_gate_up_for_tp(gate_up_w, tp: int):
    """Reorder fused [gate | up] columns into per-shard [gate_s | up_s]
    blocks so an even tp split is correct for silu_and_mul."""
    I2 = gate_up_w.shape[-1]
    gate = np.split(np.asarray(gate_up_w[..., :I2 // 2]), tp, axis=-1)
    up = np.split(np.asarray(gate_up_w[..., I2 // 2:]), tp, axis=-1)
    return jnp.asarray(np.concatenate(
        [np.concatenate([g, u], axis=-1) for g, u in zip(gate, up)],
        axis=-1))


def regroup_qkv_for_tp(qkv_w, num_q_heads: int, num_kv_heads: int,
                       head_dim: int, tp: int):
    """Reorder fused qkv output columns [q | k | v] into per-shard
    [q_s | k_s | v_s] blocks so an even tp split hands each shard its
    own heads (ref load_tensor_parallel_weights column slicing)."""
    D = head_dim
    hq, hkv = num_q_heads, num_kv_heads
    q = np.split(np.asarray(qkv_w[..., :hq * D]), tp, axis=-1)
    k = np.split(np.asarray(qkv_w[..., hq * D:(hq + hkv) * D]), tp, axis=-1)
    v = np.split(np.asarray(qkv_w[..., (hq + hkv) * D:]), tp, axis=-1)
    return jnp.asarray(np.concatenate(
        [np.concatenate([qs, ks, vs], axis=-1)
         for qs, ks, vs in zip(q, k, v)], axis=-1))
