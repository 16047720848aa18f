"""End-to-end correctness: engine output vs dense reference model.

The reference's implicit contract (made explicit in BASELINE.json): the
serving stack -- chunked prefill, arena cache, flash kernels, continuous
batching -- must produce exactly the tokens a plain dense forward pass
produces (greedy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vattention_tpu import LLMEngine, SamplingParams
from vattention_tpu.config import get_model_arch
from vattention_tpu.model_executor.layers.activation import silu_and_mul
from vattention_tpu.model_executor.layers.layernorm import rms_norm
from vattention_tpu.model_executor.layers.rotary_embedding import get_rope
from vattention_tpu.ops.attention_ref import mha_reference


# dense rollouts keyed by (model name, prompt, max_tokens): every
# engine in this file loads the same dummy-seed weights, so the dense
# expectation is identical across backend/scheduler cases -- computing
# it once cuts ~7 full-recompute rollouts from the suite (round-4
# VERDICT #6: one-shot `pytest tests/ -q` must fit 5 minutes).  A stale
# cache entry cannot hide a bug: if an engine's params differed, its
# output would mismatch the cached rollout and the assert would fire.
_dense_cache = {}


def dense_reference_cached(model_name, model, params, prompt_ids,
                           max_tokens):
    key = (model_name, tuple(prompt_ids), max_tokens)
    if key not in _dense_cache:
        _dense_cache[key] = dense_reference_generate(
            model, params, prompt_ids, max_tokens)
    return _dense_cache[key]


def dense_reference_generate(model, params, prompt_ids, max_tokens):
    """Plain full-recompute greedy decoding with jnp dense attention."""
    a = model.arch
    D = model.head_dim
    rope = model.rope
    ids = list(prompt_ids)
    for _ in range(max_tokens):
        T = len(ids)
        x = params["embed"][jnp.asarray(ids)]
        positions = jnp.arange(T)
        L = a.num_layers
        for l in range(L):
            lp = jax.tree.map(lambda p: p[l], params["layers"])
            h = rms_norm(x, lp["input_norm"], a.rms_norm_eps)
            qkv = h @ lp["qkv_w"]
            if "qkv_b" in lp:
                qkv = qkv + lp["qkv_b"]
            q = qkv[:, :model.hq * D].reshape(T, model.hq, D)
            k = qkv[:, model.hq * D:(model.hq + model.hkv) * D].reshape(
                T, model.hkv, D)
            v = qkv[:, (model.hq + model.hkv) * D:].reshape(T, model.hkv, D)
            q, k = rope(positions, q, k)
            attn = mha_reference(q, k, v, causal=True, q_start=0,
                                 sm_scale=model.sm_scale)
            x = x + attn.astype(x.dtype).reshape(T, model.hq * D) @ lp["o_w"]
            h2 = rms_norm(x, lp["post_norm"], a.rms_norm_eps)
            x = x + silu_and_mul(h2 @ lp["gate_up_w"]) @ lp["down_w"]
        x = rms_norm(x, params["final_norm"], a.rms_norm_eps)
        head = (params["embed"].T if a.tie_word_embeddings
                else params["lm_head"])
        logits = x[-1].astype(jnp.float32) @ head.astype(jnp.float32)
        ids.append(int(jnp.argmax(logits)))
    return ids[len(prompt_ids):]


@pytest.mark.parametrize("backend,scheduler,chunk,model", [
    ("fa_vattn", "sarathi", 128, "tiny-llama-debug"),   # chunked prefill
    ("fa_vattn", "vllm", 128, "tiny-llama-debug"),      # whole-prompt
    ("fa_vattn_64kb", "sarathi", 128, "tiny-llama-debug"),  # multi-extent
    ("fa_paged_128", "sarathi", 128, "tiny-llama-debug"),   # paged A/B
    ("fa_pod", "sarathi", 128, "tiny-llama-debug"),     # fused kernel
    ("fa_vattn", "sarathi", 128, "tiny-d64-debug"),     # head-dim padding
    ("fa_vattn_megacache", "sarathi", 128, "tiny-llama-debug"),  # megacache
    ("fi_unpaged", "sarathi", 128, "tiny-llama-debug"),  # contiguous alias
])
def test_engine_matches_dense_reference(backend, scheduler, chunk, model):
    engine = LLMEngine.from_engine_args(
        model=model,
        dtype="float32",          # exact match at f32
        attention_backend=backend,
        scheduler_type=scheduler,
        max_model_len=512,
        max_batch_size=4,
        max_num_seqs=4,
        chunk_size=chunk,
        gpu_memory_utilization=0.9,
    )
    rng = np.random.default_rng(5)
    prompts = {
        f"r{i}": rng.integers(1, 2000, int(n)).tolist()
        for i, n in enumerate([200, 37])
    }
    max_tokens = 6
    for seq_id, toks in prompts.items():
        engine.add_request(
            prompt=None, prompt_token_ids=toks,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=max_tokens, ignore_eos=True),
            seq_id=seq_id)
    generated = {}
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                generated[out.seq_id] = out.token_ids
        steps += 1
        assert steps < 500
    # exactness requires no preemption-restarts (those legitimately fold
    # generated tokens back into the prompt, ref sequence.py:158)
    assert engine.metrics_store.num_preempted == 0
    model_obj = engine.worker.model_runner.model
    params = engine.worker.model_runner.params
    for seq_id, toks in prompts.items():
        expect = dense_reference_cached(model, model_obj, params, toks,
                                        max_tokens)
        assert generated[seq_id] == expect, (
            f"{seq_id}: engine={generated[seq_id]} dense={expect}")
    engine.cleanup()
    # allow re-creating engines in later tests
    from vattention_tpu.metrics.metrics_store import MetricsStore
    MetricsStore._instance = None


def test_fp8_kv_cache_engine_path():
    """FP8 KV engine plumbing smoke: kv_quant=fp8 builds an fp8 arena and
    serves a rollout whose tokens mostly track the bf16 run.  The
    QUALITY gate (BASELINE <=0.1 ppl delta) is test_fp8_quality.py's
    trained-model perplexity assertion; this only guards the wiring."""
    from vattention_tpu.metrics.metrics_store import MetricsStore

    def run(kv_quant):
        MetricsStore._instance = None
        engine = LLMEngine.from_engine_args(
            model="tiny-llama-debug", dtype="float32",
            attention_backend="fa_vattn", scheduler_type="sarathi",
            max_model_len=512, max_batch_size=4, max_num_seqs=4,
            chunk_size=128, gpu_memory_utilization=0.9,
            kv_quant=kv_quant)
        rng = np.random.default_rng(11)
        toks = rng.integers(1, 2000, 100).tolist()
        engine.add_request(
            prompt=None, prompt_token_ids=toks,
            sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                           ignore_eos=True),
            seq_id="q")
        out = None
        steps = 0
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    out = o.token_ids
            steps += 1
            assert steps < 200
        engine.cleanup()
        return out

    base = run("none")
    fp8 = run("fp8")
    agree = sum(a == b for a, b in zip(base, fp8)) / len(base)
    assert agree >= 0.5, (base, fp8)
    # int8 (scaled) wiring: same smoke gate; the quality gate is the
    # trained-model ppl delta in test_fp8_quality.py
    int8 = run("int8")
    agree = sum(a == b for a, b in zip(base, int8)) / len(base)
    assert agree >= 0.5, (base, int8)


def test_max_model_len_caps_generation():
    """A request with a huge max_tokens must stop at max_model_len (the KV
    slab is sized for max_model_len; decoding past it would overflow the
    arena slot -- the failure mode of unbounded no_op/2MB-page runs)."""
    from vattention_tpu.metrics.metrics_store import MetricsStore

    MetricsStore._instance = None
    engine = LLMEngine.from_engine_args(
        model="tiny-llama-debug", attention_backend="fa_vattn",
        scheduler_type="sarathi", max_model_len=256, max_batch_size=2,
        max_num_seqs=2, chunk_size=128, gpu_memory_utilization=0.9)
    toks = list(range(1, 101))
    engine.add_request(
        prompt=None, prompt_token_ids=toks,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=10_000,
                                       ignore_eos=True),
        seq_id="cap")
    done = None
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                done = o
        steps += 1
        assert steps < 400, "request never finished at max_model_len"
    assert done is not None
    assert len(toks) + len(done.token_ids) == 256
    # over-long prompts are rejected up front
    import pytest as _pytest
    with _pytest.raises(ValueError):
        engine.add_request(
            prompt=None, prompt_token_ids=list(range(1, 300)),
            sampling_params=SamplingParams(max_tokens=1), seq_id="toolong")
    engine.cleanup()
    MetricsStore._instance = None

def test_no_op_backend_dispatch():
    """ADVICE r1: attention_backend='no_op' must actually instantiate
    NoOpAttentionBackend (not silently run the vattn path) so profiling
    runs exclude attention."""
    from vattention_tpu.model_executor.attention.no_op_backend import (
        NoOpAttentionBackend)

    engine = LLMEngine.from_engine_args(
        model="tiny-llama-debug", dtype="float32",
        attention_backend="no_op", scheduler_type="sarathi",
        max_model_len=512, max_batch_size=2, max_num_seqs=2,
        chunk_size=128, gpu_memory_utilization=0.9,
    )
    runner = engine.worker.model_runner
    assert isinstance(runner.backend, NoOpAttentionBackend)
    # snapshot to host: the device buffer itself is donated every step
    kv_before = np.asarray(runner.cache_engine.kv_cache)
    engine.add_request(
        prompt=None, prompt_token_ids=list(range(1, 65)),
        sampling_params=SamplingParams(
            temperature=0.0, max_tokens=2, ignore_eos=True),
        seq_id="n0")
    steps = 0
    while engine.has_unfinished_requests():
        engine.step()
        steps += 1
        assert steps < 50
    # the no_op path must leave the arena untouched
    np.testing.assert_array_equal(
        np.asarray(runner.cache_engine.kv_cache), kv_before)
    engine.cleanup()
    from vattention_tpu.metrics.metrics_store import MetricsStore
    MetricsStore._instance = None


def test_vllm_scheduler_batches_multiple_prompts_per_step():
    """The vLLM scheduler admits several whole prompts in ONE iteration
    (ref sarathi-lean vllm_scheduler.py:20+) and the step fuses them into
    one multi-run prefill launch -- while output stays exact."""
    engine = LLMEngine.from_engine_args(
        model="tiny-llama-debug",
        dtype="float32",
        attention_backend="fa_vattn",
        scheduler_type="vllm",
        max_model_len=512,
        max_batch_size=4,
        max_num_seqs=4,
        gpu_memory_utilization=0.9,
    )
    rng = np.random.default_rng(11)
    prompts = {f"m{i}": rng.integers(1, 2000, n).tolist()
               for i, n in enumerate([60, 30, 40])}
    for seq_id, toks in prompts.items():
        engine.add_request(
            prompt=None, prompt_token_ids=toks,
            sampling_params=SamplingParams(
                temperature=0.0, max_tokens=3, ignore_eos=True),
            seq_id=seq_id)
    # record every iteration's schedule to assert the batching shape
    recorded = []
    orig_schedule = engine.scheduler.schedule

    def recording_schedule():
        out = orig_schedule()
        recorded.append(out.scheduled_seq_metadata_list)
        return out

    engine.scheduler.schedule = recording_schedule
    generated = {}
    steps = 0
    while engine.has_unfinished_requests():
        for o in engine.step():
            if o.finished:
                generated[o.seq_id] = o.token_ids
        steps += 1
        assert steps < 100
    # the first non-empty iteration batched ALL THREE prompts
    first = next(m for m in recorded if m)
    assert sorted(x.seq_id for x in first) == ["m0", "m1", "m2"]
    assert all(x.is_prompt for x in first)
    model = engine.worker.model_runner.model
    params = engine.worker.model_runner.params
    for seq_id, toks in prompts.items():
        expect = dense_reference_cached("tiny-llama-debug", model,
                                        params, toks, 3)
        assert generated[seq_id] == expect, (
            f"{seq_id}: engine={generated[seq_id]} dense={expect}")
    engine.cleanup()
    from vattention_tpu.metrics.metrics_store import MetricsStore
    MetricsStore._instance = None
