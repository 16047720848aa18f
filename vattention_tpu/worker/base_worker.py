"""Worker: owns model runner + cache engine for one device (group).

ref: sarathi-lean/sarathi/worker/base_worker.py:45-284.  The reference
spawns one Ray actor per GPU with NCCL process groups; under
single-controller JAX one worker drives the whole mesh -- device
parallelism lives inside the jitted step (GSPMD/shard_map), so there is
no actor fan-out and no NCCL init.  Multi-host serving replicas come
from the benchmark launcher (one engine per replica).
"""

from __future__ import annotations

import os
import time
from typing import List, Optional

import numpy as np

from vattention_tpu.config import SystemConfig
from vattention_tpu.core.datatypes.scheduler_output import SchedulerOutputs
from vattention_tpu.core.datatypes.sequence import SamplerOutputs, Sequence
from vattention_tpu.core.sequence_manager.worker_sequence_manager import (
    WorkerSequenceManager,
)
from vattention_tpu.logger import init_logger
from vattention_tpu.metrics.metrics_store import MetricsStore
from vattention_tpu.model_executor.attention import AttentionBackend

logger = init_logger(__name__)

# default HBM per chip when the backend does not report it (v5e = 16GB)
_DEFAULT_HBM_BYTES = 16 * 1024**3
# headroom for activations/workspace inside the jitted step
_WORKSPACE_BYTES = 1 * 1024**3


class BaseWorker:
    def __init__(self, config: SystemConfig, *, seed: int = 0):
        self.config = config
        self.seed = seed
        self.seq_manager = WorkerSequenceManager(
            config.cache_config, config.scheduler_config)
        self.metrics_store = MetricsStore.get_or_create(config.metrics_config)
        self.cache_engine = None
        self.model_runner = None
        # async execution: dispatched steps whose sampled tokens are still
        # in flight, oldest first -- (scheduler_outputs, handle) pairs
        self._inflight: List[tuple] = []

    # ------------------------------------------------------------------ #
    def _param_bytes(self) -> int:
        a = self.config.model_config.arch
        tp = self.config.parallel_config.tensor_parallel_size
        D = a.head_dim
        per_layer = (a.hidden_size * (a.num_q_heads + 2 * a.num_kv_heads) * D
                     + a.num_q_heads * D * a.hidden_size
                     + 3 * a.hidden_size * a.intermediate_size)
        total = (a.num_layers * per_layer // tp
                 + 2 * a.vocab_size * a.hidden_size)
        return total * self.config.model_config.dtype_bytes

    def profile_num_available_blocks(
            self, memory_utilization: float) -> tuple:
        """ref model_runner.profile_num_available_blocks:119-225.

        Peak-memory math from the architecture (the reference runs a dummy
        forward; here the step's activation footprint is bounded by a
        fixed workspace reservation, and the XLA-reported per-device
        limit is used when available).
        """
        import jax

        on_tpu = jax.default_backend() == "tpu"
        total = _DEFAULT_HBM_BYTES if on_tpu else 2 * 1024**3
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats and "bytes_limit" in stats:
                total = stats["bytes_limit"]
        except Exception:  # noqa: BLE001 -- CPU backend has no stats
            pass
        workspace = _WORKSPACE_BYTES if on_tpu else 0
        memory_for_kv = int(total * memory_utilization
                            - self._param_bytes() - workspace)
        memory_for_kv = max(memory_for_kv, 64 * 1024 * 1024)

        # KV-block geometry (must match the allocator's math)
        cc = self.config.cache_config
        mc = self.config.model_config
        pc = self.config.parallel_config
        # head dim padded to the 128-lane arena alignment (cache engines)
        head_padded = -(-mc.get_head_size() // 128) * 128
        kv_bytes_per_token = (mc.get_num_kv_heads(pc) * head_padded
                              * mc.dtype_bytes * 2
                              * mc.get_num_layers(pc))
        # the arena can never use more than max concurrent context; use the
        # page-derived KV-block granularity (what the allocator will use),
        # plus one block of growth slack per slot
        kv_bytes_per_token_layer = (mc.get_num_kv_heads(pc)
                                    * head_padded * mc.dtype_bytes)
        block_tokens = max(1, cc.page_size // kv_bytes_per_token_layer)
        if block_tokens > 32:  # allocator rounds to 32-row multiples
            block_tokens -= block_tokens % 32
        per_slot_tokens = (-(-mc.max_model_len // block_tokens) + 1) \
            * block_tokens
        max_useful = (cc.max_batch_size * per_slot_tokens
                      * kv_bytes_per_token)
        memory_for_kv = min(memory_for_kv, max_useful)
        num_blocks = memory_for_kv // (cc.block_size * kv_bytes_per_token)
        logger.info(
            "profiled: %.2f GB for KV cache -> %d blocks of %d tokens",
            memory_for_kv / 2**30, num_blocks, cc.block_size)
        return int(num_blocks), int(memory_for_kv)

    # ------------------------------------------------------------------ #
    def init_cache_engine(self) -> None:
        from vattention_tpu.model_executor.model_runner import ModelRunner
        from vattention_tpu.worker.cache_engine import get_cache_engine

        pc = self.config.parallel_config
        mesh = None
        sharding = None
        if pc.tensor_parallel_size > 1 or pc.pipeline_parallel_size > 1:
            from jax.sharding import NamedSharding

            from vattention_tpu.parallel.mesh import make_serving_mesh
            from vattention_tpu.parallel.sharding import kv_cache_spec

            mesh = make_serving_mesh(
                tensor_parallel_size=pc.tensor_parallel_size,
                pipeline_parallel_size=pc.pipeline_parallel_size)
            sharding = NamedSharding(mesh, kv_cache_spec(
                tp_axis="tp" if pc.tensor_parallel_size > 1 else None,
                pp_axis="pp" if pc.pipeline_parallel_size > 1 else None))
        self.cache_engine = get_cache_engine(self.config,
                                             sharding=sharding)
        self.model_runner = ModelRunner(
            self.config, self.cache_engine, mesh=mesh, seed=self.seed)

    # ------------------------------------------------------------------ #
    def add_seq(self, seq: Sequence) -> None:
        self.seq_manager.add_seq(seq)

    def get_free_blocks(self) -> int:
        return self.cache_engine.get_free_blocks()

    def _cache_step(self, seq_metadata_list) -> None:
        """cache_engine.step with KV-alloc latency + fragmentation
        recording (BASELINE metrics: per-step blocking time of the
        allocator step, ref vattn_demo_async.py:42-77, and the <1%
        fragmentation-overhead target)."""
        from vattention_tpu.metrics.constants import CpuOperationMetrics

        t0 = time.perf_counter()
        self.cache_engine.step(seq_metadata_list)
        self.metrics_store.push_cpu_operation_time(
            CpuOperationMetrics.KV_STEP, time.perf_counter() - t0)
        alloc = getattr(self.cache_engine, "allocator", None)
        if alloc is not None:
            self.metrics_store.fragmentation.add(
                alloc.fragmentation_overhead())

    def execute_model(self, scheduler_outputs: SchedulerOutputs,
                      seq_metadata_list) -> Optional[SamplerOutputs]:
        """ref base_worker.execute_model:173-208.

        In-process the engine's sequence manager is authoritative (there is
        no Ray process boundary to replicate state across), so the worker
        receives the already-materialized metadata and only does memory +
        compute; status transitions happen once, engine-side.
        """
        # free preempted sequences' slots first (ref :183-184)
        for seq_id in scheduler_outputs.preempted_seq_ids:
            self.cache_engine.free_seq(seq_id)
        self._cache_step(seq_metadata_list)
        t0 = time.perf_counter()
        sampler_outputs = self.model_runner.run(seq_metadata_list)
        from vattention_tpu.metrics.constants import CpuOperationMetrics

        self.metrics_store.push_cpu_operation_time(
            CpuOperationMetrics.MODEL_EXECUTION, time.perf_counter() - t0)
        self.metrics_store.on_batch_end(seq_metadata_list, scheduler_outputs)
        return sampler_outputs

    # -- async execution ------------------------------------------------- #
    def execute_model_async(self, scheduler_outputs: SchedulerOutputs,
                            seq_metadata_list,
                            max_inflight: int = 2) -> List[tuple]:
        """Dispatch this step without blocking on its sampled tokens and
        return any OLDER steps whose results are now materialized:
        [(scheduler_outputs, seq_metadata_list, sampler_outputs), ...].

        The device queue keeps at most `max_inflight` unresolved steps, so
        host bookkeeping runs ~1-2 iterations behind the device -- hiding
        both the dispatch and the sampled-token round trip (which dominate
        when the chip sits behind a network tunnel)."""
        for seq_id in scheduler_outputs.preempted_seq_ids:
            self.cache_engine.free_seq(seq_id)
        self._cache_step(seq_metadata_list)
        handle = self.model_runner.run_async(seq_metadata_list)
        self.metrics_store.on_batch_end(seq_metadata_list, scheduler_outputs)
        self._inflight.append((scheduler_outputs, handle))
        resolved = []
        while self._inflight and (len(self._inflight) > max_inflight
                                  or self._inflight[0][1].is_ready()):
            resolved.append(self._resolve_oldest())
        return resolved

    def _resolve_oldest(self) -> tuple:
        scheduler_outputs, handle = self._inflight.pop(0)
        sampler_outputs = self.model_runner.resolve(handle)
        return scheduler_outputs, handle.seq_metadata_list, sampler_outputs

    def flush_inflight(self) -> List[tuple]:
        """Resolve every dispatched-but-unmaterialized step (blocking)."""
        resolved = []
        while self._inflight:
            resolved.append(self._resolve_oldest())
        return resolved

    def has_inflight_steps(self) -> bool:
        return bool(self._inflight)

    def on_step_completed(self, seq_metadata_list) -> None:
        """Free finished sequences' cache slots (after the engine has
        applied sampler outputs + stop checks)."""
        self.cache_engine.on_step_completion(seq_metadata_list)

    def profile_op_level(self, *, ctx: int = 1024,
                         iters: int = 8) -> dict:
        """Measure per-op device times (OperationMetrics rows) at this
        worker's serving shapes; see metrics/op_profiler.py."""
        from vattention_tpu.metrics.op_profiler import profile_operations

        return profile_operations(self.model_runner, ctx=ctx, iters=iters)

    # -- profiling (ref base_worker.py:222-247: torch.profiler -> chrome
    # trace; here jax.profiler -> xplane/perfetto trace dir) ------------- #
    def start_profiling(self, output_dir: str = "profiler_output") -> None:
        import jax

        os.makedirs(output_dir, exist_ok=True)
        jax.profiler.start_trace(output_dir)
        self._profiling_dir = output_dir

    def stop_profiling(self) -> None:
        import jax

        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s",
                    getattr(self, "_profiling_dir", "?"))

    def cleanup(self) -> None:
        if self.cache_engine is not None:
            self.cache_engine.cleanup()
        # drop device references so HBM is actually reclaimed -- an A/B
        # harness builds a second engine (weights + arena) right after
        # this one (ref cleanup frees the CUDA pool, vattention.cu:602)
        if self.model_runner is not None:
            self.model_runner.params = None
            self.model_runner._tok_buf = None
            self.model_runner._step_fn = None
        self.model_runner = None
        self._inflight.clear()
