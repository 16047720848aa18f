"""Scheduler semantics tests (CPU-only, no model execution).

Covers the sarathi chunked-prefill invariants the reference encodes
(sarathi_scheduler.py): one prefill per batch, chunk budgeting, decode
priority, preemption under memory pressure, dynamic chunk schedule.
"""

import time

import pytest

from vattention_tpu.config import (CacheConfig, ModelConfig,
                                   SarathiSchedulerConfig,
                                   VllmSchedulerConfig)
from vattention_tpu.core.datatypes.sampling_params import SamplingParams
from vattention_tpu.core.datatypes.sequence import Sequence
from vattention_tpu.core.datatypes.sequence_status import SequenceStatus
from vattention_tpu.core.scheduler.sarathi_scheduler import SarathiScheduler
from vattention_tpu.core.scheduler.vllm_scheduler import VLLMScheduler


def make_seq(seq_id, n_tokens, arrival=None, max_tokens=32):
    return Sequence(
        seq_id, None, list(range(1, n_tokens + 1)), 256, -1,
        arrival if arrival is not None else time.monotonic() - 1,
        SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       ignore_eos=True))


def make_sarathi(chunk=128, blocks=64, block_size=256, **kw):
    sched = SarathiScheduler(
        SarathiSchedulerConfig(chunk_size=chunk, max_num_seqs=8,
                               max_model_len=8192, **kw),
        CacheConfig(block_size=block_size, num_gpu_blocks=blocks))
    sched.set_block_manager(ModelConfig(model="tiny-llama-debug",
                                        attention_backend="fa_vattn"))
    sched.block_manager.set_free_blocks(blocks)
    return sched


def simulate_step(sched, outputs):
    """Apply the post-execution transitions the engine would."""
    for meta in outputs.scheduled_seq_metadata_list:
        seq = next(s for s in sched.running if s.seq_id == meta.seq_id)
        seq.set_status(SequenceStatus.RUNNING)
        if meta.is_prompt:
            seq.update_prompt_tokens_processed(meta.prompt_chunk_len)
        seq.set_status(SequenceStatus.PAUSED)
        if seq.prompt_processing_finished and not meta.is_prompt:
            seq.append_token_id(1)
            seq.check_stop()
    sched.on_step_completed()


def test_rolling_prefills_share_chunk_budget():
    # budget is charged in PREFILL_TOKEN_PAD (q-tile) units: each run is
    # padded to a whole tile in the compiled step, so two runs only share
    # a batch when BOTH padded runs fit the (padded) chunk budget
    sched = make_sarathi(chunk=256)
    sched.add_seq(make_seq("a", 300))
    sched.add_seq(make_seq("b", 100))
    out = sched.schedule()
    metas = out.scheduled_seq_metadata_list
    # "a" takes the whole budget; nothing left for "b"
    assert [m.seq_id for m in metas] == ["a"]
    assert metas[0].prompt_chunk_len == 256
    simulate_step(sched, out)
    # a's final chunk (44 -> one padded tile) leaves one whole 128-token
    # tile -- rolling prefills admit "b" alongside it in the SAME batch
    out = sched.schedule()
    assert [(m.seq_id, m.prompt_chunk_len)
            for m in out.scheduled_seq_metadata_list] \
        == [("a", 44), ("b", 100)]
    simulate_step(sched, out)
    # now both decode
    out = sched.schedule()
    pairs = [(m.seq_id, m.prompt_chunk_len)
             for m in out.scheduled_seq_metadata_list]
    assert ("a", 0) in pairs and ("b", 0) in pairs


def test_padded_budget_never_overflows_prefill_region():
    # a 44-token final chunk charges a full tile: a second prefill in
    # the same step must NOT be admitted when only the unpadded residue
    # would fit (the compiled step's prefill region is exactly
    # round_up(chunk) wide)
    sched = make_sarathi(chunk=128)
    sched.add_seq(make_seq("a", 300))
    sched.add_seq(make_seq("b", 100))
    for _ in range(2):
        out = sched.schedule()
        assert [m.seq_id for m in out.scheduled_seq_metadata_list] == ["a"]
        simulate_step(sched, out)
    out = sched.schedule()  # a's final 44 tokens occupy the only tile
    assert [(m.seq_id, m.prompt_chunk_len)
            for m in out.scheduled_seq_metadata_list] == [("a", 44)]
    simulate_step(sched, out)
    out = sched.schedule()  # b prefills next step, a decodes
    pairs = [(m.seq_id, m.prompt_chunk_len)
             for m in out.scheduled_seq_metadata_list]
    assert ("a", 0) in pairs and ("b", 100) in pairs


def test_one_prefill_per_batch_when_rolling_disabled():
    # the reference default (enable_rolling_prefills False,
    # sarathi_scheduler.py:41): one prefill per batch
    sched = make_sarathi(chunk=128, enable_rolling_prefills=False)
    sched.add_seq(make_seq("a", 100))
    sched.add_seq(make_seq("b", 100))
    out = sched.schedule()
    assert [(m.seq_id, m.prompt_chunk_len)
            for m in out.scheduled_seq_metadata_list] == [("a", 100)]
    simulate_step(sched, out)
    out = sched.schedule()
    pairs = [(m.seq_id, m.prompt_chunk_len)
             for m in out.scheduled_seq_metadata_list]
    assert ("a", 0) in pairs and ("b", 100) in pairs


def test_max_prefills_per_step_caps_admission():
    sched = make_sarathi(chunk=512, max_prefills_per_step=2)
    for sid in ("a", "b", "c", "d"):
        sched.add_seq(make_seq(sid, 64))
    out = sched.schedule()
    pairs = [(m.seq_id, m.prompt_chunk_len)
             for m in out.scheduled_seq_metadata_list]
    # budget (512) fits all four, but the run cap admits two
    assert pairs == [("a", 64), ("b", 64)]


def test_decode_tokens_do_not_eat_prefill_budget():
    # the compiled step gives decodes their own B rows, so a decoding
    # seq must NOT shrink the prefill chunk (diverges from the
    # reference's shared counter -- documented in
    # SarathiScheduler._get_seq_next_num_prefill_tokens)
    sched = make_sarathi(chunk=128)
    sched.add_seq(make_seq("a", 64))
    out = sched.schedule()
    simulate_step(sched, out)
    sched.add_seq(make_seq("b", 500))
    out = sched.schedule()
    chunk = next(m.prompt_chunk_len
                 for m in out.scheduled_seq_metadata_list
                 if m.seq_id == "b")
    assert chunk == 128
    assert any(m.seq_id == "a" and not m.is_prompt
               for m in out.scheduled_seq_metadata_list)


def test_preemption_under_memory_pressure():
    sched = make_sarathi(chunk=128, blocks=2, block_size=256)
    sched.add_seq(make_seq("a", 100))
    simulate_step(sched, sched.schedule())
    sched.add_seq(make_seq("b", 100))
    simulate_step(sched, sched.schedule())
    simulate_step(sched, sched.schedule())  # both prompts complete
    # pool exhausted: decoding both must preempt the lower-priority seq
    sched.block_manager.set_free_blocks(0)
    out = sched.schedule()
    assert out.preempted_seq_ids == ["b"]
    victim = next(s for s in sched.waiting if s.seq_id == "b")
    # restart-from-scratch is applied by the sequence manager on the
    # preempted ids (ref base_sequence_manager _preempt_seq)
    victim.reset_for_recompute()
    assert victim.get_num_prompt_tokens_processed() == 0
    assert victim.is_waiting()


def test_dynamic_chunk_schedule():
    sched = make_sarathi(
        chunk=128, enable_dynamic_chunking_schedule=True,
        low_chunk_size=64, high_chunk_size=256,
        chunk_schedule_max_tokens=1024, chunk_schedule_stages=4)
    # early prompt positions get the largest chunk, later the smallest
    seq = make_seq("a", 1024)
    sched.add_seq(seq)
    sizes = []
    for _ in range(12):
        out = sched.schedule()
        metas = out.scheduled_seq_metadata_list
        if not metas or not metas[0].is_prompt:
            break
        sizes.append(metas[0].prompt_chunk_len)
        simulate_step(sched, out)
    assert sizes[0] == 256
    assert sizes[-1] <= sizes[0]
    assert sum(sizes) == 1024


def test_vllm_whole_prompt_prefill():
    sched = VLLMScheduler(
        VllmSchedulerConfig(max_num_seqs=8, max_model_len=8192),
        CacheConfig(block_size=256, num_gpu_blocks=64))
    sched.set_block_manager(ModelConfig(model="tiny-llama-debug",
                                        attention_backend="fa_vattn"))
    sched.block_manager.set_free_blocks(64)
    sched.add_seq(make_seq("a", 700))
    out = sched.schedule()
    metas = out.scheduled_seq_metadata_list
    assert metas[0].prompt_chunk_len == 700  # no chunking


def test_arrival_time_gating():
    sched = make_sarathi()
    sched.add_seq(make_seq("future", 64, arrival=time.monotonic() + 60))
    out = sched.schedule()
    assert out.is_empty()
