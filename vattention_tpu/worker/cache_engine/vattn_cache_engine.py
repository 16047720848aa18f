"""vATTN cache engine: flat HBM arena + extent allocator.

ref: sarathi-lean/sarathi/worker/cache_engine/vATTN_cache_engine.py:18-195.
Owns the stacked arena array [L, 2, Hkv, R, D], maps sequences to batch
slots (best-fit reuse via the allocator), calls ``step_async`` once per
iteration, and applies any relocation plan as an async device copy
overlapped with the forward pass (the reference's background-thread
cuMemMap analog).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from vattention_tpu.config import SystemConfig
from vattention_tpu.core.datatypes.sequence import SequenceMetadata
from vattention_tpu.logger import init_logger
from vattention_tpu.memory.allocator import VAttentionAllocator
from vattention_tpu.model_executor.attention import AttentionBackend
from vattention_tpu.ops.arena_copy import apply_relocations
from vattention_tpu.worker.cache_engine.base_cache_engine import (
    BaseCacheEngine,
)

logger = init_logger(__name__)


class VAttnCacheEngine(BaseCacheEngine):
    kind = "vattn"

    def __init__(self, config: SystemConfig, *, dtype=None, sharding=None):
        super().__init__(config)
        model_config = config.model_config
        if dtype is None:
            dtype = (jnp.float32 if model_config.dtype == "float32"
                     else jnp.bfloat16)
        # FP8 KV quantization: e4m3 storage, calibration-free (e4m3's
        # dynamic range covers K/V activations; kernels upcast tiles to
        # f32 before the matmul).  Halves KV HBM footprint + bandwidth.
        if config.cache_config.kv_quant == "fp8":
            dtype = jnp.float8_e4m3fn
        # INT8 KV: round(x / KV_INT8_SCALE) storage.  Dequant is free in
        # the kernels (scale folds into sm_scale / the output epilogue,
        # attention/vattn_backend.py) and int8->bf16 widening is a
        # native VPU op, so the decode stream runs ~2x faster than the
        # fp8 manual widening (docs/PERF.md fp8-convert-cliff section).
        self.kv_scale = None
        if config.cache_config.kv_quant == "int8":
            import os as _os

            dtype = jnp.int8
            self.kv_scale = float(_os.environ.get("KV_INT8_SCALE",
                                                  "0.04"))
        cache_config = config.cache_config
        parallel_config = config.parallel_config

        self.num_layers = model_config.get_num_layers(parallel_config)
        self.num_kv_heads = model_config.get_num_kv_heads(parallel_config)
        self.head_size = model_config.get_head_size()
        # the arena's minor (lane) dim must be a 128-tile multiple for
        # aligned KV DMAs; sub-128 head dims (e.g. 64) are zero-padded.
        # Zeros are score-neutral (q.k over padded lanes adds 0; padded
        # v lanes produce output lanes the backend slices off).
        self.head_size_padded = -(-self.head_size // 128) * 128
        self.dtype = dtype
        self.max_batch_size = cache_config.max_batch_size
        backend = AttentionBackend.resolve(model_config.attention_backend)
        self.sync_mode = AttentionBackend.is_sync(backend)

        use_native = cache_config.use_native_allocator
        if use_native is None:
            # auto: prefer the native core whenever it is built (the
            # differential fuzz in tests/test_allocator.py holds the
            # two implementations to identical layouts)
            from vattention_tpu.memory.native import native_available

            use_native = native_available()
        if use_native:
            from vattention_tpu.memory.native import (
                NativeVAttentionAllocator, native_available)

            if native_available():
                self.allocator = NativeVAttentionAllocator()
            else:
                logger.warning(
                    "native allocator requested but not built "
                    "(make -C csrc); using the Python implementation")
                self.allocator = VAttentionAllocator()
        else:
            self.allocator = VAttentionAllocator()
        self.allocator.init_kvcache(
            num_layers=self.num_layers,
            num_kv_heads=self.num_kv_heads,
            head_size=self.head_size_padded,
            max_batch_size=self.max_batch_size,
            max_context_length=model_config.max_model_len,
            dtype_bytes=(1 if dtype in (jnp.float8_e4m3fn, jnp.int8)
                         else 4 if dtype == jnp.float32 else 2),
            page_size=cache_config.page_size,
            megacache=AttentionBackend.is_megacache(backend)
            or cache_config.megacache,
        )
        assert cache_config.memory_for_gpu is not None, \
            "profile memory before creating the cache engine"
        num_pages = self.allocator.reserve_physical_pages(
            cache_config.memory_for_gpu)
        self.block_tokens = self.allocator.block_tokens
        self.table_width = self.allocator.max_segments
        R = self.allocator.arena_tokens
        logger.info(
            "vATTN arena: %d KV blocks (%d pages, %d tokens/block, "
            "%d arena rows, %.2f GB)", self.allocator.num_arena_blocks,
            num_pages, self.block_tokens, R,
            self.allocator.num_arena_blocks
            * self.allocator.kvblock_bytes / 2**30)
        # one extra block of rows past the arena: scratch target for
        # padding-token scatter writes (row index R)
        self.scratch_row = max(R, 1)
        # the device array spans ALL layers; with pipeline parallelism the
        # sharding splits the layer axis over stages (num_layers above is
        # per-stage and only feeds the per-device memory math)
        # ... and ALL kv heads (tp sharding splits the head axis); the
        # per-shard counts above only feed the per-device memory math
        total_layers = model_config.get_total_num_layers()
        total_kv_heads = model_config.arch.num_kv_heads
        self.kv_cache = jnp.zeros(
            (total_layers, 2, total_kv_heads,
             self.scratch_row + self.block_tokens,
             self.head_size_padded), dtype=self.dtype)
        self.sharding = sharding
        if sharding is not None:
            import jax
            self.kv_cache = jax.device_put(self.kv_cache, sharding)

        # seq_id -> batch slot (ref vATTN_cache_engine.py:91-124)
        self.batch_idx: Dict[str, int] = {}
        self.pending_moves = 0  # telemetry

    # ------------------------------------------------------------------ #
    def _seq_len_for_step(self, meta: SequenceMetadata) -> int:
        seq = meta.seq
        if meta.is_prompt:
            return seq.get_num_prompt_tokens_processed() + meta.prompt_chunk_len
        return seq.get_len()

    def step(self, seq_metadata_list: List[SequenceMetadata]) -> None:
        # assign slots to new sequences (best-fit reuse, ref :137-143)
        for meta in seq_metadata_list:
            if meta.seq_id in self.batch_idx:
                continue
            idx = self.allocator.alloc_new_batch_idx(
                self._seq_len_for_step(meta))
            assert idx != -1, "no free batch slot (scheduler over-admitted)"
            self.batch_idx[meta.seq_id] = idx

        seq_lens = self.allocator.seq_lens.copy()
        for meta in seq_metadata_list:
            seq_lens[self.batch_idx[meta.seq_id]] = self._seq_len_for_step(meta)

        if self.sync_mode:
            plan = self.allocator.step_sync(seq_lens)
        else:
            plan = self.allocator.step_async(seq_lens)
        if plan:
            self._apply_plan(plan)

    def _apply_plan(self, plan) -> None:
        """Dispatch relocation copies asynchronously on device."""
        n = len(plan.moves)
        # pad the move list to pow2 buckets to bound recompiles
        m = 1
        while m < n:
            m *= 2
        src = np.zeros(m, np.int32)
        dst = np.zeros(m, np.int32)
        for i, mv in enumerate(plan.moves):
            src[i], dst[i] = mv.src, mv.dst
        if self.sharding is None:
            self.kv_cache = apply_relocations(
                self.kv_cache, jnp.asarray(src), jnp.asarray(dst),
                jnp.asarray([n], jnp.int32), block_tokens=self.block_tokens)
        else:
            # sharded arena: every shard moves the same rows of its own
            # slice, so the pallas copy runs per-shard under shard_map
            import jax
            from jax.sharding import PartitionSpec as P

            mesh, spec = self.sharding.mesh, self.sharding.spec
            fn = jax.jit(jax.shard_map(
                lambda c, s_, d_, nm: apply_relocations(
                    c, s_, d_, nm, block_tokens=self.block_tokens),
                mesh=mesh,
                in_specs=(spec, P(), P(), P()),
                out_specs=spec, check_vma=False),
                donate_argnums=(0,))
            self.kv_cache = fn(
                self.kv_cache, jnp.asarray(src), jnp.asarray(dst),
                jnp.asarray([n], jnp.int32))
        self.pending_moves += n

    # ------------------------------------------------------------------ #
    def slot_of(self, seq_id: str) -> int:
        return self.batch_idx[seq_id]

    def get_batch_segments(self):
        return self.allocator.get_batch_segments()

    def get_slot_rows(self, slot: int, start_pos: int, n: int) -> np.ndarray:
        """Arena rows for token positions [start_pos, start_pos+n)."""
        rows = np.empty(n, np.int32)
        seg_row, seg_tok = self.allocator.get_batch_segments()
        cum = 0
        i = 0
        for j in range(self.allocator.max_segments):
            length = int(seg_tok[slot, j])
            lo, hi = cum, cum + length
            a = max(start_pos, lo)
            b = min(start_pos + n, hi)
            if a < b:
                base = int(seg_row[slot, j])
                rows[a - start_pos:b - start_pos] = (
                    base + np.arange(a - lo, b - lo, dtype=np.int32))
                i += b - a
            cum = hi
        assert i == n, f"positions beyond mapped extents ({i} != {n})"
        return rows

    def free_seq(self, seq_id: str) -> None:
        """ref preempt_requests / on_step_completion frees (:126-129)."""
        idx = self.batch_idx.pop(seq_id, None)
        if idx is not None:
            self.allocator.free_batch_idx(idx)

    def on_step_completion(
            self, seq_metadata_list: List[SequenceMetadata]) -> None:
        for meta in seq_metadata_list:
            if meta.seq.is_finished():
                self.free_seq(meta.seq_id)

    def get_free_blocks(self) -> int:
        return int(self.allocator.num_free_kvblocks())

    def cleanup(self) -> None:
        self.allocator.cleanup()
        if self.kv_cache is not None:
            try:
                self.kv_cache.delete()  # free HBM now, not at next gc
            except Exception:  # noqa: BLE001 -- already donated/deleted
                pass
        self.kv_cache = None
