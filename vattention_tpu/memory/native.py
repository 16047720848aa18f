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
    lib.vattn_init_kvcache.argtypes = [i64] * 7 + [ctypes.c_int, i64]
    lib.vattn_reserve_physical_pages.restype = i64
    lib.vattn_reserve_physical_pages.argtypes = [i64]
    lib.vattn_block_tokens.restype = i64
    lib.vattn_num_arena_blocks.restype = i64
    lib.vattn_num_free_kvblocks.restype = i64
    lib.vattn_step_async.restype = i64
    lib.vattn_step_async.argtypes = [i64p, i32p, i32p, i64]
    lib.vattn_step_sync.restype = i64
    lib.vattn_step_sync.argtypes = [i64p, ctypes.c_int, i32p, i32p, i64]
    lib.vattn_alloc_new_batch_idx.restype = i64
    lib.vattn_alloc_new_batch_idx.argtypes = [i64]
    lib.vattn_free_batch_idx.argtypes = [i64]
    lib.vattn_set_deferred_reclamation.argtypes = [ctypes.c_int]
    lib.vattn_get_batch_segments.argtypes = [i32p, i32p]
    lib.vattn_get_seq_lens.argtypes = [i64p]
    return lib


class NativeVAttentionAllocator:
    """Drop-in for VAttentionAllocator backed by the C++ core.

    One instance per process (the C++ side is a singleton, matching the
    reference's global allocator, vattention/apis.h:1).
    """

    def __init__(self):
        self.lib = _load()
        self.is_configured = False

    def init_kvcache(self, num_layers, num_kv_heads, head_size,
                     max_batch_size, max_context_length, dtype_bytes,
                     page_size, megacache=False, max_segments=8):
        self.lib.vattn_init_kvcache(
            num_layers, num_kv_heads, head_size, max_batch_size,
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
        pages = int(self.lib.vattn_reserve_physical_pages(free_memory))
        self.block_tokens = int(self.lib.vattn_block_tokens())
        self.num_arena_blocks = int(self.lib.vattn_num_arena_blocks())
        return pages

    @property
    def arena_tokens(self) -> int:
        return self.num_arena_blocks * self.block_tokens

    @property
    def seq_lens(self) -> np.ndarray:
        out = np.zeros(self.max_batch_size, np.int64)
        self.lib.vattn_get_seq_lens(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out

    def tokens_to_blocks(self, n: int) -> int:
        return -(-int(n) // self.block_tokens)

    def blocks_to_tokens(self, n: int) -> int:
        return int(n) * self.block_tokens

    def num_free_kvblocks(self) -> int:
        return int(self.lib.vattn_num_free_kvblocks())

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
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            self._src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._moves_cap))
        return self._plan(n)

    def step_sync(self, seq_lens: Sequence[int],
                  eager_reclaim: bool = False) -> RelocationPlan:
        arr = np.asarray(seq_lens, np.int64)
        n = int(self.lib.vattn_step_sync(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            1 if eager_reclaim else 0,
            self._src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._moves_cap))
        return self._plan(n)

    def alloc_new_batch_idx(self, seqlen: int) -> int:
        return int(self.lib.vattn_alloc_new_batch_idx(int(seqlen)))

    def free_batch_idx(self, slot: int) -> None:
        self.lib.vattn_free_batch_idx(int(slot))

    def set_deferred_reclamation(self, val: bool) -> None:
        self.lib.vattn_set_deferred_reclamation(1 if val else 0)

    def get_batch_segments(self) -> Tuple[np.ndarray, np.ndarray]:
        B, S = self.max_batch_size, self.max_segments
        seg_row = np.zeros(B * S, np.int32)
        seg_tok = np.zeros(B * S, np.int32)
        self.lib.vattn_get_batch_segments(
            seg_row.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            seg_tok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return seg_row.reshape(B, S), seg_tok.reshape(B, S)

    def cleanup(self) -> None:
        self.lib.vattn_cleanup()
        self.is_configured = False
