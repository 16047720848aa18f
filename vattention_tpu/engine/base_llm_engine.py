"""BaseLLMEngine: driver-side orchestration.

ref: sarathi-lean/sarathi/engine/base_llm_engine.py:61-499.  The
reference fans out to one Ray actor per GPU; here a single in-process
worker drives the whole device mesh (parallelism is inside the jitted
step), so the _run_workers RPC layer collapses to direct calls while the
step sequence stays identical: poll free blocks -> schedule ->
execute_model -> on_step_completed.
"""

from __future__ import annotations

import time
from typing import List, Optional

from vattention_tpu.config import SystemConfig
from vattention_tpu.core.datatypes.request_output import RequestOutput
from vattention_tpu.core.datatypes.sampling_params import SamplingParams
from vattention_tpu.core.datatypes.scheduler_output import SchedulerOutputs
from vattention_tpu.core.datatypes.sequence import Sequence
from vattention_tpu.core.sequence_manager.engine_sequence_manager import (
    EngineSequenceManager,
)
from vattention_tpu.core.scheduler.scheduler_registry import SchedulerRegistry
from vattention_tpu.logger import init_logger
from vattention_tpu.metrics.metrics_store import MetricsStore
from vattention_tpu.transformers_utils.tokenizer import get_tokenizer
from vattention_tpu.utils.counter import Counter
from vattention_tpu.worker.base_worker import BaseWorker

logger = init_logger(__name__)


class BaseLLMEngine:
    def __init__(self, config: SystemConfig):
        self.config = config
        self.tokenizer = get_tokenizer(config.model_config.model)
        self.seq_manager = EngineSequenceManager(self.tokenizer)
        self.metrics_store = MetricsStore.get_or_create(config.metrics_config)
        self.seq_counter = Counter()

        # workers + memory profiling (ref :143-269)
        self.worker = BaseWorker(config, seed=config.model_config.seed)
        num_blocks, memory_for_kv = self.worker.profile_num_available_blocks(
            config.cache_config.memory_utilization)
        config.cache_config.num_gpu_blocks = num_blocks
        config.cache_config.memory_for_gpu = memory_for_kv
        self.worker.init_cache_engine()

        # For vattn backends the scheduler's accounting granularity must be
        # the allocator's page-derived KV-block size (ref CacheConfig holds
        # both block_size and page_size; here they are unified post-init).
        ce = self.worker.cache_engine
        if hasattr(ce, "allocator"):
            config.cache_config.block_size = ce.block_tokens
            config.cache_config.num_gpu_blocks = ce.allocator.num_arena_blocks

        self.scheduler = SchedulerRegistry.get(
            config.scheduler_config.type, config.scheduler_config,
            config.cache_config)
        self.scheduler.set_block_manager(config.model_config)
        self.new_seqs: List[Sequence] = []
        # async execution: host bookkeeping lags the device by <=
        # max_inflight_steps; the decode critical path never blocks on a
        # device->host round trip (the PP engine has its own pipelining)
        self.async_execution = (
            config.enable_async_execution
            and config.parallel_config.pipeline_parallel_size == 1)
        self.max_inflight_steps = config.max_inflight_steps

    # ------------------------------------------------------------------ #
    def add_request(
        self,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        seq_id: Optional[str] = None,
    ) -> None:
        """ref :307-359."""
        if arrival_time is None:
            arrival_time = time.monotonic()
        if prompt_token_ids is None:
            assert self.tokenizer is not None, \
                "no tokenizer: pass prompt_token_ids"
            prompt_token_ids = self.tokenizer.encode(prompt)
        if seq_id is None:
            seq_id = str(next(self.seq_counter))
        eos_token_id = (self.tokenizer.eos_token_id
                        if self.tokenizer is not None else -1)
        max_len = self.config.model_config.max_model_len
        if len(prompt_token_ids) >= max_len:
            raise ValueError(
                f"prompt of {len(prompt_token_ids)} tokens >= "
                f"max_model_len {max_len}")
        seq = Sequence(
            seq_id, prompt, prompt_token_ids,
            self.config.cache_config.block_size, eos_token_id,
            arrival_time, sampling_params,
            max_model_len=self.config.model_config.max_model_len)
        self.seq_manager.add_seq(seq)
        self.worker.add_seq(seq)
        self.scheduler.add_seq(seq)
        self.metrics_store.on_request_arrival(seq)

    def has_unfinished_requests(self) -> bool:
        return (self.scheduler.has_unfinished_seqs()
                or self.worker.has_inflight_steps())

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_seqs()

    # ------------------------------------------------------------------ #
    def step(self) -> List[RequestOutput]:
        """One serving iteration (ref :373-415).

        Async mode returns the outputs of older steps as their sampled
        tokens land (bounded lag); sync mode returns this step's outputs.
        """
        # memory feedback loop (ref :381-390)
        if hasattr(self.scheduler.block_manager, "set_free_blocks"):
            self.scheduler.block_manager.set_free_blocks(
                self.worker.get_free_blocks())

        import time as _time

        from vattention_tpu.metrics.constants import CpuOperationMetrics

        _t0 = _time.perf_counter()
        scheduler_outputs = self.scheduler.schedule()
        self.metrics_store.push_cpu_operation_time(
            CpuOperationMetrics.SCHEDULE, _time.perf_counter() - _t0)
        if scheduler_outputs.has_no_output():
            if self.worker.has_inflight_steps():
                return self._process_resolved(self.worker.flush_inflight())
            return []
        if scheduler_outputs.is_empty():
            self.scheduler.num_running_batches = max(
                0, self.scheduler.num_running_batches)
            if self.worker.has_inflight_steps():
                return self._process_resolved(self.worker.flush_inflight())
            return self._on_step_completed(scheduler_outputs, [], [], [])

        if not self.async_execution:
            ignored_seqs, seq_metadata_list = self.seq_manager.on_schedule(
                scheduler_outputs)
            self.metrics_store.on_batch_start()
            self.metrics_store.on_step_dispatch(seq_metadata_list)
            sampler_outputs = self.worker.execute_model(
                scheduler_outputs, seq_metadata_list)
            return self._on_step_completed(
                scheduler_outputs, ignored_seqs, seq_metadata_list,
                sampler_outputs)

        # -- async path -------------------------------------------------- #
        outputs: List[RequestOutput] = []
        # preemption resets fold generated tokens into the prompt; resolve
        # any in-flight values first so none are lost
        if (scheduler_outputs.preempted_seq_ids
                and self.worker.has_inflight_steps()):
            outputs += self._process_resolved(self.worker.flush_inflight())
        ignored_seqs, seq_metadata_list = self.seq_manager.on_schedule(
            scheduler_outputs)
        self.metrics_store.on_batch_start()
        self.metrics_store.on_step_dispatch(seq_metadata_list)
        resolved = self.worker.execute_model_async(
            scheduler_outputs, seq_metadata_list,
            max_inflight=self.max_inflight_steps)
        # value-independent bookkeeping happens at dispatch: prompt
        # progress, pause transitions, pending placeholders, length stops
        self.seq_manager.on_step_dispatched(scheduler_outputs)
        self.scheduler.on_step_completed()
        if ignored_seqs:
            outputs += self.seq_manager.generate_request_outputs(
                ignored_seqs, [])
        outputs += self._process_resolved(resolved)
        return outputs

    def _process_resolved(self, resolved) -> List[RequestOutput]:
        """Apply materialized sampler outputs of previously dispatched
        steps: patch token values, run value-dependent stop checks, free
        finished sequences, and emit their RequestOutputs."""
        import time as _time

        from vattention_tpu.metrics.constants import CpuOperationMetrics

        _t0 = _time.perf_counter()
        outputs: List[RequestOutput] = []
        for scheduler_outputs, seq_metadata_list, sampler_outputs in resolved:
            self.seq_manager.on_step_resolved(sampler_outputs)
            self.worker.on_step_completed(seq_metadata_list)
            # value-dependent stops (EOS/stop-strings) finish sequences
            # between scheduler ticks; retire them from the running queue
            self.scheduler.free_finished_seqs()
            self.scheduler.remove_finished_seqs()
            for meta in seq_metadata_list:
                seq = meta.seq
                if seq.is_finished() and not getattr(
                        seq, "_metrics_ended", False):
                    seq._metrics_ended = True
                    self.metrics_store.on_request_end(seq)
            outputs += self.seq_manager.generate_request_outputs(
                [], seq_metadata_list)
        if resolved:
            self.metrics_store.push_cpu_operation_time(
                CpuOperationMetrics.PROCESS_MODEL_OUTPUTS,
                _time.perf_counter() - _t0)
        return outputs

    def _on_step_completed(self, scheduler_outputs: SchedulerOutputs,
                           ignored_seqs, seq_metadata_list,
                           sampler_outputs) -> List[RequestOutput]:
        """ref :279-305."""
        self.seq_manager.on_step_completed(scheduler_outputs,
                                           sampler_outputs)
        self.worker.on_step_completed(seq_metadata_list)
        self.scheduler.on_step_completed()
        for meta in seq_metadata_list:
            seq = meta.seq
            if seq.is_finished() and not getattr(seq, "_metrics_ended",
                                                 False):
                seq._metrics_ended = True
                self.metrics_store.on_request_end(seq)
        return self.seq_manager.generate_request_outputs(
            ignored_seqs, seq_metadata_list)

    # ------------------------------------------------------------------ #
    def get_metric_store(self) -> MetricsStore:
        return self.metrics_store

    def pull_worker_metrics(self) -> None:
        pass  # single-process: worker shares the singleton store

    def plot_metrics(self) -> None:
        self.metrics_store.plot()

    def reset_metrics(self) -> None:
        self.metrics_store.reset()
        self.scheduler.reset_state()

    def cleanup(self) -> None:
        self.worker.cleanup()
