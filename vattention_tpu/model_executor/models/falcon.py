"""Falcon model: parallel attention + MLP, single input LayerNorm, MQA.

ref: sarathi-lean/sarathi/model_executor/models/falcon.py (547 LoC).
Shares the scan-based serving body with the llama family but computes
attention and MLP from the same normalized input and sums both into the
residual (parallel_attn), uses standard LayerNorm, and GELU MLP.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vattention_tpu.model_executor.layers.activation import gelu_new
from vattention_tpu.model_executor.models.llama import LlamaForCausalLM
from vattention_tpu.model_executor.step_inputs import StepInputs


def layer_norm(x, weight, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * weight + bias).astype(x.dtype)


class FalconForCausalLM(LlamaForCausalLM):
    def init_params(self, rng: np.random.Generator,
                    zero: bool = False) -> Dict[str, Any]:
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
            "input_norm_b": jnp.zeros((L, H), self.dtype),
            "qkv_w": w(L, H, qkv_out),
            "o_w": w(L, self.hq * D, H),
            "up_w": w(L, H, self.inter),
            "down_w": w(L, self.inter, H),
        }
        params = {
            "embed": w(a.vocab_size, H),
            "final_norm": jnp.ones((H,), self.dtype),
            "final_norm_b": jnp.zeros((H,), self.dtype),
            "layers": layers,
        }
        params["lm_head"] = w(H, a.vocab_size)
        return params

    def forward(self, params, kv_cache, inputs: StepInputs, backend,
                n_prefill_tokens: int, kv_len_hint=None):
        a = self.arch
        D = self.head_dim
        eps = 1e-5
        x = params["embed"][inputs.token_ids]
        positions = inputs.positions

        def layer_fn(carry, scanned):
            x, kv_cache = carry
            lp, lidx = scanned
            h = layer_norm(x, lp["input_norm"], lp["input_norm_b"], eps)
            qkv = h @ lp["qkv_w"]
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
            mlp = gelu_new(h @ lp["up_w"]) @ lp["down_w"]
            both = o + mlp
            if self.tp_axis is not None:
                both = jax.lax.psum(both, self.tp_axis)
            x = x + both
            return (x, kv_cache), None

        lidxs = jnp.arange(a.num_layers, dtype=jnp.int32)[:, None]
        (x, kv_cache), _ = jax.lax.scan(
            layer_fn, (x, kv_cache), (params["layers"], lidxs))
        x = layer_norm(x, params["final_norm"], params["final_norm_b"], eps)
        safe_idx = jnp.clip(inputs.sample_idx, 0, x.shape[0] - 1)
        logits = (x[safe_idx].astype(jnp.float32)
                  @ params["lm_head"].astype(jnp.float32))
        return kv_cache, logits
