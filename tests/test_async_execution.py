"""Async execution: lagged host materialization must not change results.

The async path (device-side token feedback + pending placeholders,
model_runner.run_async / BaseLLMEngine async step) must produce exactly
the tokens the synchronous path produces -- the lag is an implementation
detail of hiding the host<->device round trip.
"""

import numpy as np
import pytest

from vattention_tpu import LLMEngine, SamplingParams
from vattention_tpu.core.datatypes.sampling_params import (
    SamplingParams as SP,
)
from vattention_tpu.core.datatypes.sequence import Sequence
from vattention_tpu.core.datatypes.sequence_status import SequenceStatus


def _run_engine(async_mode: bool, max_inflight: int = 2,
                num_requests: int = 2, max_tokens: int = 5):
    from vattention_tpu.metrics.metrics_store import MetricsStore

    MetricsStore._instance = None
    engine = LLMEngine.from_engine_args(
        model="tiny-llama-debug", dtype="float32",
        attention_backend="fa_vattn", scheduler_type="sarathi",
        max_model_len=512, max_batch_size=4, max_num_seqs=4,
        chunk_size=128, gpu_memory_utilization=0.9,
        enable_async_execution=async_mode,
        max_inflight_steps=max_inflight)
    rng = np.random.default_rng(7)
    prompts = {f"r{i}": rng.integers(1, 2000, int(n)).tolist()
               for i, n in enumerate([150, 45, 100])}
    for seq_id, toks in list(prompts.items())[:num_requests]:
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
    engine.cleanup()
    MetricsStore._instance = None
    return generated


def test_async_matches_sync():
    sync = _run_engine(async_mode=False)
    for depth in (1, 3):
        async_out = _run_engine(async_mode=True, max_inflight=depth)
        assert async_out == sync, (depth, async_out, sync)


def test_outputs_expose_only_resolved_tokens():
    """Mid-run RequestOutputs must never contain pending placeholders."""
    from vattention_tpu.metrics.metrics_store import MetricsStore

    MetricsStore._instance = None
    engine = LLMEngine.from_engine_args(
        model="tiny-llama-debug", dtype="float32",
        attention_backend="fa_vattn", scheduler_type="sarathi",
        max_model_len=512, max_batch_size=2, max_num_seqs=2,
        chunk_size=128, enable_async_execution=True)
    toks = np.random.default_rng(3).integers(1, 2000, 100).tolist()
    engine.add_request(prompt=None, prompt_token_ids=toks,
                       sampling_params=SamplingParams(
                           temperature=0.0, max_tokens=6, ignore_eos=True),
                       seq_id="s")
    steps = 0
    while engine.has_unfinished_requests():
        for out in engine.step():
            assert all(t >= 0 for t in out.token_ids), out.token_ids
        steps += 1
        assert steps < 200
    engine.cleanup()
    MetricsStore._instance = None


# --------------- pure host-side pending-token machinery ---------------- #
def _mk_seq(**sp):
    return Sequence("x", None, [1, 2, 3], 16, eos_token_id=9,
                    arrival_time=0.0,
                    sampling_params=SP(temperature=0.0, max_tokens=4, **sp))


def test_pending_token_lifecycle():
    seq = _mk_seq(ignore_eos=True)
    seq.update_prompt_tokens_processed(3)
    seq.append_pending_token()
    seq.append_pending_token()
    assert seq.get_len() == 5 and seq.num_pending_tokens == 2
    assert seq.get_resolved_output_token_ids() == []
    i0 = seq.resolve_pending_token(11)
    assert i0 == 0 and seq.output_token_ids[0] == 11
    i1 = seq.resolve_pending_token(12)
    assert i1 == 1 and seq.get_resolved_output_token_ids() == [11, 12]


def test_length_stop_at_dispatch():
    seq = _mk_seq(ignore_eos=True)
    seq.update_prompt_tokens_processed(3)
    for _ in range(4):
        seq.append_pending_token()
        seq.check_length_stop()
    assert seq.get_status() == SequenceStatus.FINISHED_LENGTH_CAPPED


def test_eos_truncation_invalidates_speculative_tail():
    seq = _mk_seq(ignore_eos=False)
    seq.update_prompt_tokens_processed(3)
    gen0 = seq.generation
    for _ in range(3):
        seq.append_pending_token()
    seq.resolve_pending_token(5)
    idx = seq.resolve_pending_token(9)  # EOS value lands at index 1
    seq.truncate_and_finish(idx, SequenceStatus.FINISHED_STOPPED)
    assert seq.get_output_token_ids() == [5, 9]
    assert seq.num_pending_tokens == 0
    assert seq.generation == gen0 + 1
    assert seq.is_finished()


def test_preemption_drops_pending():
    seq = _mk_seq(ignore_eos=True)
    seq.update_prompt_tokens_processed(3)
    seq.set_status(SequenceStatus.RUNNING)
    seq.append_pending_token()
    seq.resolve_pending_token(7)
    seq.append_pending_token()
    seq.reset_for_recompute()
    # resolved token folds into the prompt; the in-flight one is dropped
    assert seq.prompt_token_ids == [1, 2, 3, 7]
    assert seq.output_token_ids == []
    assert seq.num_pending_tokens == 0
