"""Parallelism tests on the virtual CPU mesh: TP and PP serving steps
must reproduce the single-device forward exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vattention_tpu.config import get_model_arch
from vattention_tpu.model_executor.attention.vattn_backend import (
    VattnAttentionBackend,
)
from vattention_tpu.model_executor.models.llama import LlamaForCausalLM
from vattention_tpu.model_executor.step_inputs import StepInputs
from vattention_tpu.parallel.mesh import make_serving_mesh
from vattention_tpu.parallel.pipeline import (pipeline_stage_step,
                                              split_microbatches)
from vattention_tpu.parallel.sharding import (kv_cache_spec,
                                              llama_param_specs,
                                              regroup_gate_up_for_tp,
                                              regroup_qkv_for_tp)

S = 8
R = 1024
BT = 256  # block tokens


def make_state(arch, B, seed=0):
    rng = np.random.default_rng(seed)
    full = LlamaForCausalLM(arch, dtype=jnp.float32)
    params = full.init_params(rng)
    cache = jnp.asarray(
        rng.standard_normal(
            (arch.num_layers, 2, arch.num_kv_heads, R + BT,
             arch.head_dim)) * 0.1, jnp.float32)
    seqlens = np.array([300, 40, 512, 7][:B], np.int32)
    seg_row = np.zeros((B, S), np.int32)
    seg_cum = np.zeros((B, S + 1), np.int32)
    for b in range(B):
        seg_row[b, 0] = b * BT
        # give each seq two extents to exercise the lookup
        seg_row[b, 1] = (B + b) * BT
        seg_cum[b, 1:] = [BT, 2 * BT, 2 * BT, 2 * BT, 2 * BT, 2 * BT,
                          2 * BT, 2 * BT]
    rows = np.array([seg_row[b, 0] + (seqlens[b] - 1) % BT if seqlens[b] <= BT
                     else seg_row[b, 1] + (seqlens[b] - 1 - BT)
                     for b in range(B)], np.int32)
    inputs = StepInputs(
        token_ids=jnp.asarray(rng.integers(1, arch.vocab_size, B),
                              jnp.int32),
        positions=jnp.asarray(seqlens - 1, jnp.int32),
        append_rows=jnp.asarray(rows),
        pre_seg_row=jnp.zeros(S, jnp.int32),
        pre_seg_cum=jnp.zeros(S + 1, jnp.int32),
        pre_qinfo=jnp.zeros(2, jnp.int32),
        dec_seg_row=jnp.asarray(seg_row),
        dec_seg_cum=jnp.asarray(seg_cum),
        dec_seqlens=jnp.asarray(seqlens),
        sample_idx=jnp.arange(B, dtype=jnp.int32),
        temperatures=jnp.zeros(B, jnp.float32),
        top_p=jnp.ones(B, jnp.float32),
        top_k=jnp.full(B, -1, jnp.int32),
        rng=jax.random.PRNGKey(0),
    )
    backend = VattnAttentionBackend(
        block_tokens=BT, num_segments=S, max_context_len=R, arena_rows=R,
        q_tile=128, scratch_row=R)
    return full, params, cache, inputs, backend


def test_tp_matches_single_device():
    arch = get_model_arch("tiny-llama-debug")
    B, tp = 4, 2
    full, params, cache, inputs, backend = make_state(arch, B)
    _, ref_logits = full.forward(params, cache, inputs, backend, 0)

    mesh = make_serving_mesh(tensor_parallel_size=tp)
    params_tp = dict(params)
    params_tp["layers"] = dict(params["layers"])
    params_tp["layers"]["qkv_w"] = regroup_qkv_for_tp(
        params["layers"]["qkv_w"], arch.num_q_heads, arch.num_kv_heads,
        arch.head_dim, tp)
    params_tp["layers"]["gate_up_w"] = regroup_gate_up_for_tp(
        params["layers"]["gate_up_w"], tp)
    model_tp = LlamaForCausalLM(arch, dtype=jnp.float32, tp_size=tp,
                                tp_axis="tp")
    specs = llama_param_specs(tp_axis="tp")
    stepm = jax.jit(jax.shard_map(
        lambda p, c, i: model_tp.forward(p, c, i, backend, 0),
        mesh=mesh,
        in_specs=(specs, kv_cache_spec(tp_axis="tp"),
                  jax.tree.map(lambda _: P(), inputs)),
        out_specs=(kv_cache_spec(tp_axis="tp"), P()),
        check_vma=False))
    _, tp_logits = stepm(params_tp, cache, inputs)
    np.testing.assert_allclose(np.asarray(tp_logits),
                               np.asarray(ref_logits), atol=2e-3, rtol=2e-3)


def test_pp_pipeline_matches_single_device():
    arch = get_model_arch("tiny-llama-debug")
    B, pp, M = 4, 2, 2
    full, params, cache, inputs, backend = make_state(arch, B)
    kv_ref, ref_logits = full.forward(params, cache, inputs, backend, 0)

    mesh = make_serving_mesh(pipeline_parallel_size=pp)
    inputs_m = split_microbatches(inputs, M, 0)
    specs = llama_param_specs(tp_axis=None, pp_axis="pp")

    def body(p, c, i):
        return pipeline_stage_step(
            full, backend, p, c, i, n_pre=0, num_micro=M, num_stages=pp,
            pp_axis="pp")

    stepm = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(specs, kv_cache_spec(tp_axis=None, pp_axis="pp"),
                  jax.tree.map(lambda _: P(), inputs_m)),
        out_specs=(kv_cache_spec(tp_axis=None, pp_axis="pp"), P("pp")),
        check_vma=False))
    kv_pp, logits_pp = stepm(params, cache, inputs_m)
    # stage outputs stacked on pp axis; last stage's logits are real
    got = np.asarray(logits_pp).reshape(pp, M, B // M, arch.vocab_size)[-1]
    got = got.reshape(B, arch.vocab_size)
    # microbatching changes matmul batch shapes -> small f32 drift
    np.testing.assert_allclose(got, np.asarray(ref_logits),
                               atol=2e-2, rtol=1e-2)
    assert (got.argmax(-1) == np.asarray(ref_logits).argmax(-1)).all()
    # pipelined cache updates must equal the dense run's (the scratch
    # rows past R legitimately hold junk from masked pipeline ticks)
    np.testing.assert_allclose(np.asarray(kv_pp)[:, :, :, :R],
                               np.asarray(kv_ref)[:, :, :, :R],
                               atol=1e-3, rtol=1e-3)


def test_pp_engine_matches_single_engine():
    """Engine-level: pp=2 / tp=2 produce the exact tokens of 1-device."""
    from vattention_tpu import LLMEngine, SamplingParams
    from vattention_tpu.metrics.metrics_store import MetricsStore

    def run(pp, tp=1):
        MetricsStore._instance = None
        engine = LLMEngine.from_engine_args(
            model="tiny-llama-debug", dtype="float32",
            attention_backend="fa_vattn", scheduler_type="sarathi",
            max_model_len=512, max_batch_size=4, max_num_seqs=4,
            chunk_size=128, gpu_memory_utilization=0.9,
            pipeline_parallel_size=pp, tensor_parallel_size=tp)
        rng = np.random.default_rng(3)
        prompts = {f"r{i}": rng.integers(1, 2000, n).tolist()
                   for i, n in enumerate([100, 50])}
        for sid, toks in prompts.items():
            engine.add_request(
                prompt=None, prompt_token_ids=toks,
                sampling_params=__import__(
                    "vattention_tpu").SamplingParams(
                    temperature=0.0, max_tokens=4, ignore_eos=True),
                seq_id=sid)
        out = {}
        steps = 0
        while engine.has_unfinished_requests():
            for o in engine.step():
                if o.finished:
                    out[o.seq_id] = o.token_ids
            steps += 1
            assert steps < 300
        engine.cleanup()
        return out

    single = run(1)
    pipelined = run(2)
    assert single == pipelined, (single, pipelined)
    tensor = run(1, tp=2)
    assert single == tensor, (single, tensor)
    both = run(2, tp=2)
    assert single == both, (single, both)
