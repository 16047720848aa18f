"""ctypes bindings for the native C++ allocator (csrc/vattn_allocator.cc).

Build: ``make -C csrc`` (pure g++, no pybind11).  The native allocator
mirrors memory/allocator.py's API and semantics (tests compare them
behaviorally); it exists to keep per-step host bookkeeping off the
serving critical path at large arena sizes, the role the reference's
C++ vattention extension plays (vattention/vattention.cu).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from vattention_tpu.memory.allocator import Relocation, RelocationPlan

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libvattn_tpu.so")


def native_available() -> bool:
    return os.path.exists(_LIB_PATH)


def _load():
    lib = ctypes.CDLL(_LIB_PATH)
    i64, i32p, i64p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                      ctypes.POINTER(ctypes.c_int64))
    lib.vattn_create.restype = i64
    lib.vattn_destroy.argtypes = [i64]
    lib.vattn_init_kvcache.argtypes = [i64] * 8 + [ctypes.c_int, i64]
    lib.vattn_reserve_physical_pages.restype = i64
    lib.vattn_reserve_physical_pages.argtypes = [i64, i64]
    lib.vattn_block_tokens.restype = i64
    lib.vattn_block_tokens.argtypes = [i64]
    lib.vattn_num_arena_blocks.restype = i64
    lib.vattn_num_arena_blocks.argtypes = [i64]
    lib.vattn_num_free_kvblocks.restype = i64
    lib.vattn_num_free_kvblocks.argtypes = [i64]
    lib.vattn_step_async.restype = i64
    lib.vattn_step_async.argtypes = [i64, i64p, i32p, i32p, i64]
    lib.vattn_step_sync.restype = i64
    lib.vattn_step_sync.argtypes = [i64, i64p, ctypes.c_int, i32p, i32p,
                                    i64]
    lib.vattn_alloc_new_batch_idx.restype = i64
    lib.vattn_alloc_new_batch_idx.argtypes = [i64, i64]
    lib.vattn_free_batch_idx.argtypes = [i64, i64]
    lib.vattn_set_deferred_reclamation.argtypes = [i64, ctypes.c_int]
    lib.vattn_get_batch_segments.argtypes = [i64, i32p, i32p]
    lib.vattn_get_seq_lens.argtypes = [i64, i64p]
    lib.vattn_cleanup.argtypes = [i64]
    return lib


class NativeVAttentionAllocator:
    """Drop-in for VAttentionAllocator backed by the C++ core.

    Handle-based: each Python instance owns a C++ instance (created via
    vattn_create), so multiple engines -- serving replicas, A/B
    harnesses -- coexist in one process.  The reference is a process
    singleton (vattention/apis.h:1).
    """

    def __init__(self):
        self.lib = _load()
        self._h = int(self.lib.vattn_create())
        self.is_configured = False

    def __del__(self):
        try:
            self.lib.vattn_destroy(self._h)
        except Exception:  # noqa: BLE001 -- interpreter teardown
            pass

    def init_kvcache(self, num_layers, num_kv_heads, head_size,
                     max_batch_size, max_context_length, dtype_bytes,
                     page_size, megacache=False, max_segments=8):
        self.lib.vattn_init_kvcache(
            self._h, num_layers, num_kv_heads, head_size, max_batch_size,
            max_context_length, dtype_bytes, page_size,
            1 if megacache else 0, max_segments)
        self.max_batch_size = max_batch_size
        self.max_segments = max_segments
        self.num_layers = num_layers
        self.megacache = megacache
        self.page_size = page_size
        self.pages_per_kvblock = 2 if megacache else 2 * num_layers
        self.kvblock_bytes = self.pages_per_kvblock * page_size
        self.is_configured = True
        self._moves_cap = 1 << 16
        self._src = np.zeros(self._moves_cap, np.int32)
        self._dst = np.zeros(self._moves_cap, np.int32)

    def reserve_physical_pages(self, free_memory: int) -> int:
        pages = int(self.lib.vattn_reserve_physical_pages(
            self._h, free_memory))
        self.block_tokens = int(self.lib.vattn_block_tokens(self._h))
        self.num_arena_blocks = int(
            self.lib.vattn_num_arena_blocks(self._h))
        return pages

    @property
    def arena_tokens(self) -> int:
        return self.num_arena_blocks * self.block_tokens

    @property
    def seq_lens(self) -> np.ndarray:
        out = np.zeros(self.max_batch_size, np.int64)
        self.lib.vattn_get_seq_lens(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out

    def tokens_to_blocks(self, n: int) -> int:
        return -(-int(n) // self.block_tokens)

    def blocks_to_tokens(self, n: int) -> int:
        return int(n) * self.block_tokens

    def num_free_kvblocks(self) -> int:
        return int(self.lib.vattn_num_free_kvblocks(self._h))

    def _plan(self, n: int) -> RelocationPlan:
        plan = RelocationPlan()
        assert n <= self._moves_cap, "relocation plan overflow"
        for i in range(n):
            plan.moves.append(Relocation(int(self._src[i]),
                                         int(self._dst[i])))
        return plan

    def step_async(self, seq_lens: Sequence[int]) -> RelocationPlan:
        arr = np.asarray(seq_lens, np.int64)
        n = int(self.lib.vattn_step_async(
            self._h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._moves_cap))
        return self._plan(n)

    def step_sync(self, seq_lens: Sequence[int],
                  eager_reclaim: bool = False) -> RelocationPlan:
        arr = np.asarray(seq_lens, np.int64)
        n = int(self.lib.vattn_step_sync(
            self._h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            1 if eager_reclaim else 0,
            self._src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._moves_cap))
        return self._plan(n)

    def alloc_new_batch_idx(self, seqlen: int) -> int:
        return int(self.lib.vattn_alloc_new_batch_idx(self._h, int(seqlen)))

    def free_batch_idx(self, slot: int) -> None:
        self.lib.vattn_free_batch_idx(self._h, int(slot))

    def set_deferred_reclamation(self, val: bool) -> None:
        self.lib.vattn_set_deferred_reclamation(self._h, 1 if val else 0)

    def get_batch_segments(self) -> Tuple[np.ndarray, np.ndarray]:
        B, S = self.max_batch_size, self.max_segments
        seg_row = np.zeros(B * S, np.int32)
        seg_tok = np.zeros(B * S, np.int32)
        self.lib.vattn_get_batch_segments(
            self._h,
            seg_row.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            seg_tok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return seg_row.reshape(B, S), seg_tok.reshape(B, S)

    def fragmentation_overhead(self) -> float:
        """Fraction of arena blocks lost to over-commitment/headroom
        (mirrors memory/allocator.py:878-887)."""
        if getattr(self, "num_arena_blocks", 0) == 0:
            return 0.0
        seq_lens = self.seq_lens
        seg_row, seg_tok = self.get_batch_segments()
        required = int(sum(self.tokens_to_blocks(int(s))
                           for s in seq_lens if s > 0))
        used = int(sum(
            int(seg_tok[b].sum()) // self.block_tokens
            for b in range(self.max_batch_size) if seq_lens[b] > 0))
        return (used - required) / self.num_arena_blocks

    def cleanup(self) -> None:
        self.lib.vattn_cleanup(self._h)
        self.is_configured = False
