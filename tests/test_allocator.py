"""Allocator behavioral tests.

Mirrors microbenchmarks/vattn_samples/vattn_demo_{sync,async}.py: simulated
dynamic workload with growing seqlens, add/remove requests, plus invariants
the reference only asserts implicitly (run disjointness, accounting).
"""

import numpy as np
import pytest

from vattention_tpu.memory import VAttentionAllocator, RelocationPlan

MB = 1024 * 1024
KB = 1024


def make_alloc(max_bs=8, max_ctx=4096, page_size=64 * KB, layers=4,
               kv_heads=2, head=128, mem_mb=64, megacache=False,
               max_segments=8):
    a = VAttentionAllocator()
    a.init_kvcache(
        num_layers=layers, num_kv_heads=kv_heads, head_size=head,
        max_batch_size=max_bs, max_context_length=max_ctx,
        dtype_bytes=2, page_size=page_size, megacache=megacache,
        max_segments=max_segments)
    a.reserve_physical_pages(mem_mb * MB)
    return a


def check_invariants(a: VAttentionAllocator):
    # every mapped extent is exactly owned by its slot; extents disjoint
    owned = np.full(a.num_arena_blocks, -1, dtype=np.int64)
    for s in range(a.max_batch_size):
        n = int(a.mapped_blocks[s])
        if n == 0:
            assert a.run_offset[s] == -1
            assert a.nsegs[s] == 0
            continue
        total = 0
        for off, m in a._slot_segments(s):
            assert m > 0
            assert off >= 0 and off + m <= a.num_arena_blocks
            assert (owned[off:off + m] == -1).all(), "overlapping extents"
            owned[off:off + m] = s
            total += m
        assert total == n
        assert a.nsegs[s] <= a.max_segments
    np.testing.assert_array_equal(owned, a.block_owner.astype(np.int64))
    # active requests have enough blocks for their tokens
    for s in range(a.max_batch_size):
        if a.seq_lens[s] > 0:
            assert a.mapped_blocks[s] >= a.tokens_to_blocks(a.seq_lens[s])


def test_block_geometry():
    a = make_alloc(page_size=64 * KB, kv_heads=2, head=128, layers=4)
    # 64KB / (2*128*2B) = 128 tokens per page
    assert a.block_tokens == 128
    assert a.pages_per_kvblock == 8  # 2 * num_layers
    assert a.tokens_to_blocks(1) == 1
    assert a.tokens_to_blocks(128) == 1
    assert a.tokens_to_blocks(129) == 2


def test_megacache_geometry():
    a = make_alloc(page_size=64 * KB, kv_heads=2, head=128, layers=4,
                   megacache=True)
    # page holds all layers: 64KB / (2*128*2B*4) = 32 tokens
    assert a.block_tokens == 32
    assert a.pages_per_kvblock == 2


def test_basic_growth_and_free():
    a = make_alloc()
    sid = a.alloc_new_batch_idx(300)
    assert sid == 0
    plan = a.step_sync(a.seq_lens.copy())
    assert not plan  # fresh run: no copies
    assert a.mapped_blocks[0] == a.tokens_to_blocks(300)
    check_invariants(a)
    a.free_batch_idx(sid)
    assert not a.is_active_req(sid)
    # deferred reclaim (default): blocks remain mapped for reuse
    assert a.mapped_blocks[0] > 0
    assert a.num_free_kvblocks() == a.num_arena_blocks  # all free-or-overcommitted


def test_best_fit_slot_reuse():
    a = make_alloc()
    # create two inactive slots with warm runs of different sizes
    s0 = a.alloc_new_batch_idx(1024)
    a.step_sync(a.seq_lens.copy())
    s1 = a.alloc_new_batch_idx(256)
    a.step_sync(a.seq_lens.copy())
    a.free_batch_idx(s0)
    a.free_batch_idx(s1)
    big, small = a.mapped_blocks[s0], a.mapped_blocks[s1]
    assert big > small
    # a 200-token request should pick the *smaller* adequate warm slot
    sid = a.alloc_new_batch_idx(200)
    assert sid == s1
    check_invariants(a)


def test_decode_growth_in_place_no_copy():
    a = make_alloc()
    sid = a.alloc_new_batch_idx(100)
    a.step_sync(a.seq_lens.copy())
    # grow one token at a time across several block boundaries
    total_relocs = 0
    for t in range(101, 600):
        a.seq_lens[sid] = t
        plan = a.step_async(a.seq_lens.copy())
        total_relocs += len(plan)
        check_invariants(a)
    # single request in an empty arena: tail always free -> zero copies
    assert total_relocs == 0
    assert a.nsegs[sid] == 1
    # eager growth should keep a lookahead block mapped
    assert a.mapped_blocks[sid] >= a.tokens_to_blocks(600)


def _collide(a):
    """Place two runs adjacently, then force s0 to outgrow into s1."""
    s0 = a.alloc_new_batch_idx(128)
    a.step_sync(a.seq_lens.copy())
    s1 = a.alloc_new_batch_idx(
        a.blocks_to_tokens(a.num_arena_blocks - int(a.mapped_blocks[s0]) - 2))
    a.step_sync(a.seq_lens.copy())
    a.seq_lens[s0] = a.blocks_to_tokens(int(a.mapped_blocks[s0])) + 1
    return s0, s1


def test_collision_opens_extent_without_copy():
    a = make_alloc(max_bs=4, mem_mb=16, max_segments=8)
    s0, s1 = _collide(a)
    plan = a.step_sync(a.seq_lens.copy())
    check_invariants(a)
    # tpu-native fast path: new extent, zero device copies
    assert not plan.moves
    assert a.nsegs[s0] == 2


def test_collision_relocates_in_strict_mode():
    a = make_alloc(max_bs=4, mem_mb=16, max_segments=1)
    s0, s1 = _collide(a)
    plan = a.step_sync(a.seq_lens.copy())
    check_invariants(a)
    assert plan.moves, "strict contiguity must copy on collision"
    assert a.nsegs[s0] == 1


def test_oom_raises():
    a = make_alloc(max_bs=2, mem_mb=1, max_ctx=4096)
    sid = a.alloc_new_batch_idx(16)
    a.step_sync(a.seq_lens.copy())
    with pytest.raises(RuntimeError, match="OOM"):
        a.seq_lens[sid] = 4096
        a.step_sync(a.seq_lens.copy())


def test_reclaim_from_overcommitted():
    a = make_alloc(max_bs=4, mem_mb=4)
    total = a.num_arena_blocks
    # slot 0 grabs ~half the arena then frees (deferred reclaim keeps blocks)
    s0 = a.alloc_new_batch_idx(a.blocks_to_tokens(total // 2))
    a.step_sync(a.seq_lens.copy())
    a.free_batch_idx(s0)
    # new request needs more than the remaining free pool -> must reclaim
    need_blocks = total - total // 4
    s1 = a.alloc_new_batch_idx(a.blocks_to_tokens(need_blocks))
    assert s1 != -1
    a.step_sync(a.seq_lens.copy())
    check_invariants(a)
    assert a.mapped_blocks[s1] >= need_blocks


def test_eager_reclamation_mode():
    a = make_alloc()
    a.set_deferred_reclamation(False)
    s0 = a.alloc_new_batch_idx(300)
    a.step_sync(a.seq_lens.copy())
    mapped = int(a.mapped_blocks[s0])
    a.free_batch_idx(s0)
    # background reclaim trims one block per async step
    for i in range(mapped):
        a.step_async(a.seq_lens.copy())
    # slot 0 is also the next-prefill candidate, which do_reclaim_pages
    # skips; activate another slot to make slot 0 reclaimable
    assert a.mapped_blocks[s0] == mapped  # protected as next-prefill target
    s1 = a.alloc_new_batch_idx(10)
    assert s1 == s0  # best-fit reuses the warm slot
    a.free_batch_idx(s1)


def test_dynamic_workload_simulation():
    """ref microbenchmarks/vattn_samples/vattn_demo_async.py:38-100."""
    rng = np.random.default_rng(0)
    a = make_alloc(max_bs=8, mem_mb=32, max_ctx=2048)
    active = {}  # sid -> remaining decode steps
    for it in range(400):
        # maybe admit a new request
        if len(active) < 6 and rng.random() < 0.3:
            prompt = int(rng.integers(10, 500))
            sid = a.alloc_new_batch_idx(prompt)
            if sid >= 0:
                if a.tokens_to_blocks(prompt) > a.num_free_kvblocks():
                    a.free_batch_idx(sid)
                else:
                    active[sid] = int(rng.integers(5, 50))
        # decode step: everyone grows by 1
        for sid in list(active):
            a.seq_lens[sid] += 1
            active[sid] -= 1
        plan = a.step_async(a.seq_lens.copy())
        check_invariants(a)
        for sid in [s for s, d in active.items() if d <= 0]:
            a.free_batch_idx(sid)
            del active[sid]
    # fragmentation stays bounded
    assert a.fragmentation_overhead() < 0.5


def test_batch_token_offsets():
    a = make_alloc()
    s0 = a.alloc_new_batch_idx(50)
    a.step_sync(a.seq_lens.copy())
    offs = a.get_batch_token_offsets()
    assert offs.shape == (a.max_batch_size,)
    assert offs[s0] == a.run_offset[s0] * a.block_tokens


class ArenaMirror:
    """Host-side simulation of the device arena: applies RelocationPlans
    exactly as the Pallas copy kernel would (sequential per-block moves)
    and checks data integrity per request."""

    def __init__(self, a):
        self.a = a
        self.data = np.full(a.num_arena_blocks, -1, dtype=np.int64)
        self.contents = {}  # sid -> list of payloads in run order

    def _rows(self, sid):
        rows = []
        for off, m in self.a._slot_segments(sid):
            rows.extend(range(off, off + m))
        return rows

    def write_new_blocks(self, sid):
        """After a step: stamp payloads into newly mapped blocks."""
        rows = self._rows(sid)
        cur = self.contents.setdefault(sid, [])
        while len(cur) < len(rows):
            payload = hash((sid, len(cur))) % (1 << 31)
            self.data[rows[len(cur)]] = payload
            cur.append(payload)
        del cur[len(rows):]

    def apply(self, plan):
        for m in plan.moves:
            self.data[m.dst] = self.data[m.src]

    def check(self):
        for sid, payloads in self.contents.items():
            rows = self._rows(sid)
            for i in range(min(len(rows), len(payloads))):
                assert self.data[rows[i]] == payloads[i], (
                    f"slot {sid} block {i} corrupted after relocation")


@pytest.mark.parametrize("max_segments", [1, 2, 8])
def test_relocation_plan_preserves_data(max_segments):
    """Move ordering must be safe under sequential execution (the device
    kernel contract), including defragmentation with cycles."""
    rng = np.random.default_rng(7)
    a = make_alloc(max_bs=8, mem_mb=8, max_ctx=4096,
                   max_segments=max_segments)
    mirror = ArenaMirror(a)
    active = {}
    for it in range(600):
        if len(active) < 7 and rng.random() < 0.5:
            prompt = int(rng.integers(10, 1500))
            if a.tokens_to_blocks(prompt) < a.num_free_kvblocks():
                sid = a.alloc_new_batch_idx(prompt)
                if sid >= 0:
                    active[sid] = int(rng.integers(4, 80))
                    mirror.contents.pop(sid, None)
        while a.num_free_kvblocks() < len(active) and len(active) > 1:
            victim = list(active)[-1]
            a.free_batch_idx(victim)
            del active[victim]
            mirror.contents.pop(victim, None)
        for sid in list(active):
            a.seq_lens[sid] += 1
            active[sid] -= 1
        plan = a.step_async(a.seq_lens.copy())
        mirror.apply(plan)
        for sid in active:
            mirror.write_new_blocks(sid)
        mirror.check()
        check_invariants(a)
        for sid in [s for s, d in active.items() if d <= 0]:
            a.free_batch_idx(sid)
            del active[sid]
            mirror.contents.pop(sid, None)


def test_native_allocator_parity():
    """C++ allocator behaves like the Python reference implementation
    on a random dynamic workload (geometry, accounting, data integrity
    of its relocation plans)."""
    from vattention_tpu.memory.native import (NativeVAttentionAllocator,
                                              native_available)

    if not native_available():
        pytest.skip("native allocator not built (make -C csrc)")

    nat = NativeVAttentionAllocator()
    nat.init_kvcache(num_layers=4, num_kv_heads=2, head_size=128,
                     max_batch_size=8, max_context_length=4096,
                     dtype_bytes=2, page_size=64 * KB)
    nat.reserve_physical_pages(8 * MB)
    ref = make_alloc(max_bs=8, mem_mb=8, max_ctx=4096)
    assert nat.block_tokens == ref.block_tokens
    assert nat.num_arena_blocks == ref.num_arena_blocks

    # a second simultaneous instance (different geometry) proves the
    # handle-based C ABI isolates engines in one process (multi-replica)
    other = NativeVAttentionAllocator()
    other.init_kvcache(num_layers=2, num_kv_heads=4, head_size=128,
                       max_batch_size=4, max_context_length=2048,
                       dtype_bytes=2, page_size=64 * KB)
    other.reserve_physical_pages(4 * MB)
    other_sid = other.alloc_new_batch_idx(100)
    other.step_async(other.seq_lens)
    other_segs = other.get_batch_segments()

    rng = np.random.default_rng(7)
    mirror = ArenaMirror2(nat)
    active = {}
    for it in range(1000):
        if len(active) < 7 and rng.random() < 0.5:
            prompt = int(rng.integers(10, 1500))
            if nat.tokens_to_blocks(prompt) < nat.num_free_kvblocks():
                sid = nat.alloc_new_batch_idx(prompt)
                rid = ref.alloc_new_batch_idx(prompt)
                assert sid == rid
                if sid >= 0:
                    active[sid] = int(rng.integers(4, 80))
                    mirror.contents.pop(sid, None)
        while nat.num_free_kvblocks() < len(active) and len(active) > 1:
            victim = list(active)[-1]
            nat.free_batch_idx(victim)
            ref.free_batch_idx(victim)
            del active[victim]
            mirror.contents.pop(victim, None)
        seq_lens = nat.seq_lens
        for sid in list(active):
            seq_lens[sid] += 1
            active[sid] -= 1
        plan = nat.step_async(seq_lens.copy())
        ref.step_async(seq_lens.copy())
        # free-block accounting stays consistent with the reference impl
        assert abs(nat.num_free_kvblocks()
                   - ref.num_free_kvblocks()) <= 4
        if it % 50 == 0:
            # the two implementations walk identical layouts
            nrow, ntok = nat.get_batch_segments()
            rrow, rtok = ref.get_batch_segments()
            np.testing.assert_array_equal(nrow, rrow)
            np.testing.assert_array_equal(ntok, rtok)
        mirror.apply(plan)
        for sid in active:
            mirror.write_new_blocks(sid)
        mirror.check()
        for sid in [s for s, d in active.items() if d <= 0]:
            nat.free_batch_idx(sid)
            ref.free_batch_idx(sid)
            del active[sid]
    # the second instance was untouched by 1000 steps on the first
    np.testing.assert_array_equal(other.get_batch_segments()[0],
                                  other_segs[0])
    np.testing.assert_array_equal(other.get_batch_segments()[1],
                                  other_segs[1])
    assert other.seq_lens[other_sid] == 100


class ArenaMirror2:
    """ArenaMirror for the native allocator (segment tables via API)."""

    def __init__(self, a):
        self.a = a
        self.data = np.full(a.num_arena_blocks, -1, dtype=np.int64)
        self.contents = {}

    def _rows(self, sid):
        seg_row, seg_tok = self.a.get_batch_segments()
        rows = []
        bt = self.a.block_tokens
        for j in range(self.a.max_segments):
            if seg_tok[sid, j] == 0:
                continue
            start = seg_row[sid, j] // bt
            n = seg_tok[sid, j] // bt
            rows.extend(range(start, start + n))
        return rows

    apply = ArenaMirror.apply
    write_new_blocks = ArenaMirror.write_new_blocks
    check = ArenaMirror.check
