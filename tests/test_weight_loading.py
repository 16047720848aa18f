"""Safetensors weight loading: HF llama layout -> our stacked pytree.

ref: sarathi-lean model_executor/weight_utils.py:134-282 (HF snapshot
iteration + TP-sharded slicing).  Here: synthesize a tiny HF-style
checkpoint on disk, load through the real path, and check exact numeric
placement (q/k/v concat + transpose, gate/up fusion, TP column/row
shards) against the raw tensors.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from safetensors.numpy import save_file

from vattention_tpu.config import ModelConfig, get_model_arch
from vattention_tpu.model_executor.models import get_model_class
from vattention_tpu.model_executor.weight_utils import load_weights


ARCH = get_model_arch("tiny-llama-debug")


def synth_checkpoint(tmp_path, rng):
    a = ARCH
    H, D = a.hidden_size, a.head_dim
    raw = {}
    for l in range(a.num_layers):
        p = f"model.layers.{l}."
        raw[p + "self_attn.q_proj.weight"] = rng.standard_normal(
            (a.num_q_heads * D, H)).astype(np.float32)
        raw[p + "self_attn.k_proj.weight"] = rng.standard_normal(
            (a.num_kv_heads * D, H)).astype(np.float32)
        raw[p + "self_attn.v_proj.weight"] = rng.standard_normal(
            (a.num_kv_heads * D, H)).astype(np.float32)
        raw[p + "self_attn.o_proj.weight"] = rng.standard_normal(
            (H, a.num_q_heads * D)).astype(np.float32)
        raw[p + "mlp.gate_proj.weight"] = rng.standard_normal(
            (a.intermediate_size, H)).astype(np.float32)
        raw[p + "mlp.up_proj.weight"] = rng.standard_normal(
            (a.intermediate_size, H)).astype(np.float32)
        raw[p + "mlp.down_proj.weight"] = rng.standard_normal(
            (H, a.intermediate_size)).astype(np.float32)
        raw[p + "input_layernorm.weight"] = rng.standard_normal(
            H).astype(np.float32)
        raw[p + "post_attention_layernorm.weight"] = rng.standard_normal(
            H).astype(np.float32)
    raw["model.embed_tokens.weight"] = rng.standard_normal(
        (a.vocab_size, H)).astype(np.float32)
    raw["model.norm.weight"] = rng.standard_normal(H).astype(np.float32)
    raw["lm_head.weight"] = rng.standard_normal(
        (a.vocab_size, H)).astype(np.float32)
    save_file(raw, str(tmp_path / "model.safetensors"))
    # HF-style config.json so the engine can resolve the arch from the dir
    import json
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "llama", "num_hidden_layers": a.num_layers,
        "num_attention_heads": a.num_q_heads,
        "num_key_value_heads": a.num_kv_heads, "head_dim": a.head_dim,
        "hidden_size": a.hidden_size,
        "intermediate_size": a.intermediate_size,
        "vocab_size": a.vocab_size,
        "max_position_embeddings": a.max_position_embeddings,
    }))
    return raw


def _load(tmp_path, tp_size=1, tp_rank=0):
    model_cls = get_model_class(ARCH.model_type)
    model = model_cls(ARCH, dtype=jnp.float32, tp_size=tp_size)
    cfg = ModelConfig(model=str(tmp_path), load_format="safetensors")
    cfg.arch = ARCH
    return model, load_weights(model, cfg, tp_rank=tp_rank)


def test_safetensors_single_rank(tmp_path):
    rng = np.random.default_rng(0)
    raw = synth_checkpoint(tmp_path, rng)
    model, params = _load(tmp_path)
    a = ARCH
    D = a.head_dim
    l = 1
    p = f"model.layers.{l}."
    qkv = np.concatenate([raw[p + "self_attn.q_proj.weight"],
                          raw[p + "self_attn.k_proj.weight"],
                          raw[p + "self_attn.v_proj.weight"]], axis=0).T
    np.testing.assert_allclose(np.asarray(params["layers"]["qkv_w"][l]),
                               qkv, rtol=1e-6)
    gu = np.concatenate([raw[p + "mlp.gate_proj.weight"],
                         raw[p + "mlp.up_proj.weight"]], axis=0).T
    np.testing.assert_allclose(
        np.asarray(params["layers"]["gate_up_w"][l]), gu, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["layers"]["o_w"][l]),
                               raw[p + "self_attn.o_proj.weight"].T,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["embed"]),
                               raw["model.embed_tokens.weight"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["lm_head"]),
                               raw["lm_head.weight"].T, rtol=1e-6)


def test_safetensors_tp_shards_tile_the_full_matrix(tmp_path):
    """Concatenating both tp ranks' column shards reproduces the rank-1
    load; row shards split the input axis."""
    rng = np.random.default_rng(1)
    synth_checkpoint(tmp_path, rng)
    _, full = _load(tmp_path, tp_size=1)
    _, r0 = _load(tmp_path, tp_size=2, tp_rank=0)
    _, r1 = _load(tmp_path, tp_size=2, tp_rank=1)
    a = ARCH
    D = a.head_dim
    l = 0
    # column shards (out axis): q halves then k halves then v halves
    hq, hkv = a.num_q_heads // 2, a.num_kv_heads // 2
    fq = np.asarray(full["layers"]["qkv_w"][l])[:, :a.num_q_heads * D]
    s0 = np.asarray(r0["layers"]["qkv_w"][l])[:, :hq * D]
    s1 = np.asarray(r1["layers"]["qkv_w"][l])[:, :hq * D]
    np.testing.assert_allclose(np.concatenate([s0, s1], axis=1), fq,
                               rtol=1e-6)
    # row shard (in axis) of o_w
    fo = np.asarray(full["layers"]["o_w"][l])
    o0 = np.asarray(r0["layers"]["o_w"][l])
    o1 = np.asarray(r1["layers"]["o_w"][l])
    np.testing.assert_allclose(np.concatenate([o0, o1], axis=0), fo,
                               rtol=1e-6)


def test_safetensors_falcon_layout(tmp_path):
    """Falcon fused-MQA checkpoint layout loads into the falcon pytree."""
    from vattention_tpu.config import ModelArch
    from vattention_tpu.model_executor.weight_utils import (
        load_safetensors_falcon)

    arch = ModelArch("falcon", num_layers=2, num_q_heads=4, num_kv_heads=1,
                     head_dim=64, hidden_size=256, intermediate_size=1024,
                     vocab_size=512, max_position_embeddings=2048,
                     parallel_attn=True)
    model_cls = get_model_class("falcon")
    model = model_cls(arch, dtype=jnp.float32, tp_size=1)
    rng = np.random.default_rng(4)
    H, D = arch.hidden_size, arch.head_dim
    qkv_out = (arch.num_q_heads + 2 * arch.num_kv_heads) * D
    raw = {}
    for l in range(arch.num_layers):
        p = f"transformer.h.{l}."
        raw[p + "self_attention.query_key_value.weight"] = \
            rng.standard_normal((qkv_out, H)).astype(np.float32)
        raw[p + "self_attention.dense.weight"] = rng.standard_normal(
            (H, arch.num_q_heads * D)).astype(np.float32)
        raw[p + "mlp.dense_h_to_4h.weight"] = rng.standard_normal(
            (arch.intermediate_size, H)).astype(np.float32)
        raw[p + "mlp.dense_4h_to_h.weight"] = rng.standard_normal(
            (H, arch.intermediate_size)).astype(np.float32)
        raw[p + "input_layernorm.weight"] = rng.standard_normal(
            H).astype(np.float32)
        raw[p + "input_layernorm.bias"] = rng.standard_normal(
            H).astype(np.float32)
    raw["transformer.word_embeddings.weight"] = rng.standard_normal(
        (arch.vocab_size, H)).astype(np.float32)
    raw["transformer.ln_f.weight"] = rng.standard_normal(
        H).astype(np.float32)
    raw["transformer.ln_f.bias"] = rng.standard_normal(
        H).astype(np.float32)
    save_file(raw, str(tmp_path / "model.safetensors"))

    class Cfg:
        model = str(tmp_path)

    params = load_safetensors_falcon(model, Cfg)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["qkv_w"][1]),
        raw["transformer.h.1.self_attention.query_key_value.weight"].T,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["embed"]),
        raw["transformer.word_embeddings.weight"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["lm_head"]),
        raw["transformer.word_embeddings.weight"].T, rtol=1e-6)


def test_engine_runs_with_safetensors_weights(tmp_path):
    """The engine produces the same greedy tokens whether the weights
    come from the safetensors path or are injected directly."""
    from vattention_tpu import LLMEngine, SamplingParams
    from vattention_tpu.metrics.metrics_store import MetricsStore

    rng = np.random.default_rng(2)
    synth_checkpoint(tmp_path, rng)
    MetricsStore._instance = None
    engine = LLMEngine.from_engine_args(
        model=str(tmp_path),
        dtype="float32", load_format="safetensors",
        attention_backend="fa_vattn", scheduler_type="sarathi",
        max_model_len=256, max_batch_size=2, max_num_seqs=2,
        chunk_size=128)
    toks = rng.integers(1, 2000, 50).tolist()
    engine.add_request(prompt=None, prompt_token_ids=toks,
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=4, ignore_eos=True),
                       seq_id="w")
    out = None
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                out = o.token_ids
        steps += 1
        assert steps < 100
    assert out is not None and len(out) == 4
    engine.cleanup()
    MetricsStore._instance = None
