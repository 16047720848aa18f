"""Llama-family model (llama/yi/mistral/qwen/internlm share this body).

ref: sarathi-lean/sarathi/model_executor/models/llama.py:340-360 (plus
yi.py, mistral.py, qwen.py, internlm.py -- all the same pre-norm
RMSNorm + GQA attention + SwiGLU MLP pattern; qwen/internlm add qkv
bias).  TPU-first differences:

  - Functional: params are a pytree with layer weights STACKED on a
    leading [L] axis and the transformer body is one ``lax.scan`` -- one
    kernel trace regardless of depth (the attention kernels take the
    layer index as data).
  - The KV cache is the flat arena [L, 2, Hkv, R, D], donated through the
    scan carry and updated in place by the append kernel.
  - Tensor parallelism: the per-shard weights follow the Megatron pattern
    (qkv/gate_up column-split on the head/ffn axis, o/down row-split)
    and the forward issues explicit ``psum`` over the "tp" mesh axis
    after o-proj and down-proj when run under shard_map
    (ref parallel_utils/tensor_parallel/layers.py:72,182,315).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vattention_tpu.config import ModelArch
from vattention_tpu.model_executor.layers.activation import silu_and_mul
from vattention_tpu.model_executor.layers.layernorm import rms_norm
from vattention_tpu.model_executor.layers.rotary_embedding import get_rope
from vattention_tpu.model_executor.step_inputs import StepInputs


class LlamaForCausalLM:
    """Model definition + forward; weights live in a separate pytree."""

    def __init__(self, arch: ModelArch, *, dtype=jnp.bfloat16,
                 tp_size: int = 1, tp_axis: Optional[str] = None):
        assert arch.num_q_heads % tp_size == 0
        assert arch.num_kv_heads % tp_size == 0 or tp_size % arch.num_kv_heads == 0
        self.arch = arch
        self.dtype = dtype
        self.tp_size = tp_size
        self.tp_axis = tp_axis
        self.hq = arch.num_q_heads // tp_size
        self.hkv = max(1, arch.num_kv_heads // tp_size)
        self.head_dim = arch.head_dim
        self.inter = arch.intermediate_size // tp_size
        self.rope = get_rope(arch.head_dim, arch.head_dim,
                             arch.max_position_embeddings, arch.rope_theta,
                             arch.rope_scaling)
        self.sm_scale = 1.0 / (arch.head_dim ** 0.5)

    # ------------------------------------------------------------------ #
    def init_params(self, rng: np.random.Generator,
                    zero: bool = False) -> Dict[str, Any]:
        """Random (load_format=dummy) or zero (load_format=zero, fast
        benchmark init) per-TP-shard weights."""
        a = self.arch
        H = a.hidden_size
        D = self.head_dim
        qkv_out = (self.hq + 2 * self.hkv) * D

        def w(*shape, scale=0.02):
            if zero:
                return jnp.zeros(shape, dtype=self.dtype)
            return jnp.asarray(
                rng.standard_normal(shape) * scale, dtype=self.dtype)

        L = a.num_layers
        layers = {
            "input_norm": jnp.ones((L, H), self.dtype),
            "qkv_w": w(L, H, qkv_out),
            "o_w": w(L, self.hq * D, H),
            "post_norm": jnp.ones((L, H), self.dtype),
            "gate_up_w": w(L, H, 2 * self.inter),
            "down_w": w(L, self.inter, H),
        }
        if a.qkv_bias:
            layers["qkv_b"] = jnp.zeros((L, qkv_out), self.dtype)
        params = {
            "embed": w(a.vocab_size, H, scale=0.02),
            "final_norm": jnp.ones((H,), self.dtype),
            "layers": layers,
        }
        if not a.tie_word_embeddings:
            params["lm_head"] = w(H, a.vocab_size)
        return params

    # ------------------------------------------------------------------ #
    # Composable pieces: pipeline parallelism runs embed on the first
    # stage, a slice of run_layers per stage, and head on the last
    # (ref models/llama.py:285-292 layer partitioning + :345-358 stage
    # edge send/recv -- here ppermute between shard_map stages).
    # ------------------------------------------------------------------ #
    def embed(self, params, token_ids):
        return params["embed"][token_ids]  # [T, H]

    def run_layers(self, layer_params, kv_cache, x, inputs: StepInputs,
                   backend, n_prefill_tokens: int, kv_len_hint=None):
        """Scan a stack of layers; ``kv_cache`` holds exactly the layers
        in ``layer_params`` (local indexing)."""
        a = self.arch
        D = self.head_dim
        positions = inputs.positions

        def layer_fn(carry, scanned):
            x, kv_cache = carry
            lp, lidx = scanned
            h = rms_norm(x, lp["input_norm"], a.rms_norm_eps)
            qkv = h @ lp["qkv_w"]
            if "qkv_b" in lp:
                qkv = qkv + lp["qkv_b"]
            T = qkv.shape[0]
            q = qkv[:, :self.hq * D].reshape(T, self.hq, D)
            k = qkv[:, self.hq * D:(self.hq + self.hkv) * D].reshape(
                T, self.hkv, D)
            v = qkv[:, (self.hq + self.hkv) * D:].reshape(T, self.hkv, D)
            q, k = self.rope(positions, q, k)
            kv_cache = backend.append_kv(kv_cache, k, v, inputs, lidx,
                                         n_prefill_tokens)
            attn = backend.attend(q, kv_cache, inputs, lidx,
                                  n_prefill_tokens, sm_scale=self.sm_scale,
                                  kv_len_hint=kv_len_hint)
            o = attn.reshape(T, self.hq * D) @ lp["o_w"]
            if self.tp_axis is not None:
                o = jax.lax.psum(o, self.tp_axis)
            x = x + o
            h2 = rms_norm(x, lp["post_norm"], a.rms_norm_eps)
            mlp = silu_and_mul(h2 @ lp["gate_up_w"]) @ lp["down_w"]
            if self.tp_axis is not None:
                mlp = jax.lax.psum(mlp, self.tp_axis)
            x = x + mlp
            return (x, kv_cache), None

        num_layers = jax.tree.leaves(layer_params)[0].shape[0]
        lidxs = jnp.arange(num_layers, dtype=jnp.int32)[:, None]
        (x, kv_cache), _ = jax.lax.scan(
            layer_fn, (x, kv_cache), (layer_params, lidxs))
        return x, kv_cache

    def head(self, params, x, sample_idx):
        a = self.arch
        x = rms_norm(x, params["final_norm"], a.rms_norm_eps)
        safe_idx = jnp.clip(sample_idx, 0, x.shape[0] - 1)
        hs = x[safe_idx]  # [B, H]
        head = (params["embed"].T if a.tie_word_embeddings
                else params["lm_head"])
        # bf16 MXU matmul with f32 accumulation: casting the [H, V] head
        # to f32 would add ~3x its bytes in HBM traffic every step
        return jnp.dot(hs, head, preferred_element_type=jnp.float32)

    def forward(self, params, kv_cache, inputs: StepInputs, backend,
                n_prefill_tokens: int, kv_len_hint=None):
        """Returns (kv_cache, logits [B, V_shard])."""
        x = self.embed(params, inputs.token_ids)
        x, kv_cache = self.run_layers(
            params["layers"], kv_cache, x, inputs, backend,
            n_prefill_tokens, kv_len_hint=kv_len_hint)
        return kv_cache, self.head(params, x, inputs.sample_idx)
