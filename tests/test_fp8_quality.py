"""FP8 KV-cache quality gate: <=0.1 perplexity delta vs bf16 KV.

BASELINE.md north star: "<=0.1 ppl delta with FP8 KV cache".  Zero-egress
build, so instead of a downloaded checkpoint the test TRAINS the tiny
llama on a structured synthetic corpus (order-2 Markov chain) until it
has real predictive structure, routes the weights through the actual
safetensors loading path, and measures teacher-forced perplexity through
the SERVING stack (arena append + Pallas prefill attention) with a bf16
vs an fp8 KV arena.  Random-weight token agreement (the round-2 gate)
could not see quantization damage; a trained model's ppl can.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from vattention_tpu.config import ModelConfig, get_model_arch
from vattention_tpu.model_executor.layers.activation import silu_and_mul
from vattention_tpu.model_executor.layers.layernorm import rms_norm
from vattention_tpu.model_executor.models import get_model_class
from vattention_tpu.model_executor.weight_utils import load_weights

ARCH = get_model_arch("tiny-llama-debug")
VOCAB_USED = 64          # symbols actually emitted by the corpus
SEQ_LEN = 128


# --------------------------------------------------------------------- #
# synthetic structured corpus: sparse order-1 Markov chain (entropy
# ~0.92 nats/token -> achievable ppl ~2.5; a fixed global seed keeps the
# transition table identical between train and eval corpora)
# --------------------------------------------------------------------- #
_CHAIN = np.random.default_rng(99).integers(
    1, VOCAB_USED, size=(VOCAB_USED, 4))


def make_corpus(rng, n_seqs, seq_len):
    probs = np.array([0.7, 0.15, 0.1, 0.05])
    seqs = np.zeros((n_seqs, seq_len), np.int64)
    for i in range(n_seqs):
        seqs[i, 0] = rng.integers(1, VOCAB_USED)
        ks = rng.choice(4, size=seq_len, p=probs)
        for t in range(1, seq_len):
            seqs[i, t] = _CHAIN[seqs[i, t - 1], ks[t]]
    return seqs


# --------------------------------------------------------------------- #
# differentiable dense forward in the serving model's param space
# --------------------------------------------------------------------- #
def dense_logits(model, params, ids):
    """ids: [B, T] -> logits [B, T, V] (teacher-forced, causal)."""
    a = model.arch
    D = model.head_dim
    B, T = ids.shape
    positions = jnp.arange(T)

    def one(seq_ids):
        x = params["embed"][seq_ids]
        for l in range(a.num_layers):
            lp = jax.tree.map(lambda p: p[l], params["layers"])
            h = rms_norm(x, lp["input_norm"], a.rms_norm_eps)
            qkv = h @ lp["qkv_w"]
            q = qkv[:, :model.hq * D].reshape(T, model.hq, D)
            k = qkv[:, model.hq * D:(model.hq + model.hkv) * D].reshape(
                T, model.hkv, D)
            v = qkv[:, (model.hq + model.hkv) * D:].reshape(
                T, model.hkv, D)
            q, k = model.rope(positions, q, k)
            qf = q.astype(jnp.float32).reshape(T, model.hkv, -1, D)
            s = jnp.einsum("qhgd,khd->hgqk", qf,
                           k.astype(jnp.float32)) * model.sm_scale
            mask = positions[:, None] >= positions[None, :]
            s = jnp.where(mask[None, None], s, -jnp.inf)
            p = jax.nn.softmax(s, axis=-1)
            attn = jnp.einsum("hgqk,khd->qhgd", p,
                              v.astype(jnp.float32))
            x = x + attn.astype(x.dtype).reshape(T, -1) @ lp["o_w"]
            h2 = rms_norm(x, lp["post_norm"], a.rms_norm_eps)
            x = x + silu_and_mul(h2 @ lp["gate_up_w"]) @ lp["down_w"]
        x = rms_norm(x, params["final_norm"], a.rms_norm_eps)
        head = (params["embed"].T if a.tie_word_embeddings
                else params["lm_head"])
        return jnp.dot(x, head, preferred_element_type=jnp.float32)

    return jax.vmap(one)(ids)


def train_tiny_model(rng, steps=120):
    import optax

    model_cls = get_model_class(ARCH.model_type)
    model = model_cls(ARCH, dtype=jnp.float32)
    params = model.init_params(rng)
    data = make_corpus(rng, 48, SEQ_LEN)

    def loss_fn(params, ids):
        logits = dense_logits(model, params, ids)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        return nll.mean()

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, ids):
        loss, g = jax.value_and_grad(loss_fn)(params, ids)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    for i in range(steps):
        batch = jnp.asarray(data[rng.integers(0, len(data), 8)])
        params, state, loss = step(params, state, batch)
    return model, params, float(loss), data


def save_hf_checkpoint(tmp_path, params):
    """Invert our stacked pytree to HF llama names (roundtrip-checked)."""
    a = ARCH
    D = a.head_dim
    raw = {}
    for l in range(a.num_layers):
        p = f"model.layers.{l}."
        W = np.asarray(params["layers"]["qkv_w"][l], np.float32).T
        raw[p + "self_attn.q_proj.weight"] = W[:a.num_q_heads * D]
        raw[p + "self_attn.k_proj.weight"] = \
            W[a.num_q_heads * D:(a.num_q_heads + a.num_kv_heads) * D]
        raw[p + "self_attn.v_proj.weight"] = \
            W[(a.num_q_heads + a.num_kv_heads) * D:]
        raw[p + "self_attn.o_proj.weight"] = np.asarray(
            params["layers"]["o_w"][l], np.float32).T
        GU = np.asarray(params["layers"]["gate_up_w"][l], np.float32).T
        raw[p + "mlp.gate_proj.weight"] = GU[:a.intermediate_size]
        raw[p + "mlp.up_proj.weight"] = GU[a.intermediate_size:]
        raw[p + "mlp.down_proj.weight"] = np.asarray(
            params["layers"]["down_w"][l], np.float32).T
        raw[p + "input_layernorm.weight"] = np.asarray(
            params["layers"]["input_norm"][l], np.float32)
        raw[p + "post_attention_layernorm.weight"] = np.asarray(
            params["layers"]["post_norm"][l], np.float32)
    raw["model.embed_tokens.weight"] = np.asarray(params["embed"],
                                                  np.float32)
    raw["model.norm.weight"] = np.asarray(params["final_norm"], np.float32)
    raw["lm_head.weight"] = np.asarray(params["lm_head"], np.float32).T
    # safetensors serializes the raw buffer IGNORING strides: a
    # transposed view would be silently stored in the wrong order
    raw = {k: np.ascontiguousarray(v) for k, v in raw.items()}
    save_file(raw, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "llama", "num_hidden_layers": a.num_layers,
        "num_attention_heads": a.num_q_heads,
        "num_key_value_heads": a.num_kv_heads, "head_dim": a.head_dim,
        "hidden_size": a.hidden_size,
        "intermediate_size": a.intermediate_size,
        "vocab_size": a.vocab_size,
        "max_position_embeddings": a.max_position_embeddings,
    }))


# --------------------------------------------------------------------- #
# teacher-forced perplexity through the serving stack
# --------------------------------------------------------------------- #
def serving_ppl(model, params, tokens, kv_dtype, kv_scale=None):
    """One chunked-prefill pass with the real arena append + Pallas
    prefill kernels; returns ppl over positions 1..T-1."""
    from vattention_tpu.model_executor.attention.vattn_backend import (
        VattnAttentionBackend)
    from vattention_tpu.model_executor.step_inputs import StepInputs
    from vattention_tpu.ops.utils import round_up

    a = model.arch
    T = len(tokens)
    n_pre = round_up(T, 128)
    S = 8
    BT = 256
    R = round_up(n_pre, BT) + BT
    backend = VattnAttentionBackend(
        block_tokens=BT, num_segments=S, max_context_len=n_pre,
        arena_rows=R, q_tile=128, scratch_row=R - 1,
        kv_scale=kv_scale)
    kv_cache = jnp.zeros((a.num_layers, 2, a.num_kv_heads, R, a.head_dim),
                         kv_dtype)
    token_ids = np.zeros(n_pre, np.int32)
    token_ids[:T] = tokens
    rows = np.full(n_pre, -1, np.int32)
    rows[:T] = np.arange(T)
    pre_seg_row = np.zeros((1, S), np.int32)
    pre_seg_cum = np.zeros((1, S + 1), np.int32)
    pre_seg_cum[0, 1:] = R
    pre_qinfo = np.asarray([[0, T]], np.int32)
    qt_run = np.zeros((n_pre // 128, 2), np.int32)
    qt_run[:, 1] = np.arange(n_pre // 128)
    pre_runs = np.zeros((S, 3), np.int32)
    pre_runs[0] = (0, 0, T)
    inputs = StepInputs(
        token_ids=jnp.asarray(token_ids),
        positions=jnp.asarray(np.arange(n_pre, dtype=np.int32)),
        append_rows=jnp.asarray(rows),
        pre_seg_row=jnp.asarray(pre_seg_row),
        pre_seg_cum=jnp.asarray(pre_seg_cum),
        pre_qinfo=jnp.asarray(pre_qinfo),
        dec_seg_row=jnp.zeros((0, S), jnp.int32),
        dec_seg_cum=jnp.zeros((0, S + 1), jnp.int32),
        dec_seqlens=jnp.zeros(0, jnp.int32),
        sample_idx=jnp.zeros(0, jnp.int32),
        temperatures=jnp.zeros(0, jnp.float32),
        top_p=jnp.ones(0, jnp.float32),
        top_k=jnp.full(0, -1, jnp.int32),
        rng=jax.random.PRNGKey(0),
        pre_runs=jnp.asarray(pre_runs),
        qt_run=jnp.asarray(qt_run),
    )
    x = model.embed(params, inputs.token_ids)
    x, _ = model.run_layers(params["layers"], kv_cache, x, inputs,
                            backend, n_pre)
    x = rms_norm(x, params["final_norm"], a.rms_norm_eps)
    head = (params["embed"].T if a.tie_word_embeddings
            else params["lm_head"])
    logits = jnp.dot(x[:T], head, preferred_element_type=jnp.float32)
    logp = jax.nn.log_softmax(logits[:-1], axis=-1)
    tgt = jnp.asarray(tokens[1:])
    nll = -jnp.take_along_axis(logp, tgt[:, None], -1)[:, 0]
    return float(jnp.exp(nll.mean()))


def test_fp8_kv_cache_ppl_delta(tmp_path):
    rng = np.random.default_rng(0)
    model, params, train_loss, data = train_tiny_model(rng)

    # route weights through the real safetensors path (loader roundtrip)
    save_hf_checkpoint(tmp_path, params)
    cfg = ModelConfig(model=str(tmp_path), load_format="safetensors")
    cfg.arch = ARCH
    model_f32 = get_model_class(ARCH.model_type)(ARCH, dtype=jnp.float32)
    loaded = load_weights(model_f32, cfg)
    np.testing.assert_allclose(
        np.asarray(loaded["layers"]["qkv_w"]),
        np.asarray(params["layers"]["qkv_w"]), atol=1e-6)

    # held-out eval sequence from the same chain
    eval_ids = make_corpus(np.random.default_rng(1234), 1,
                           SEQ_LEN)[0].tolist()
    ppl_bf16 = serving_ppl(model_f32, loaded, eval_ids, jnp.bfloat16)
    ppl_fp8 = serving_ppl(model_f32, loaded, eval_ids, jnp.float8_e4m3fn)

    # the model must have learned real structure for the gate to mean
    # anything (uniform over the used vocab would be ~64)
    assert ppl_bf16 < 20.0, (ppl_bf16, train_loss)
    # BASELINE north star: <=0.1 perplexity delta with FP8 KV
    assert abs(ppl_fp8 - ppl_bf16) <= 0.1, (ppl_bf16, ppl_fp8)

    # INT8 KV (scaled): the fast quantized path (docs/PERF.md fp8
    # convert cliff -- int8 widening is a native VPU op).  Same gate.
    ppl_int8 = serving_ppl(model_f32, loaded, eval_ids, jnp.int8,
                           kv_scale=0.04)
    assert abs(ppl_int8 - ppl_bf16) <= 0.1, (ppl_bf16, ppl_int8)
