"""Pallas kernel correctness vs pure-jnp reference attention.

Mirrors the reference's kernel test strategy (pod_attn/tests/*: allclose
against stock FlashAttention, atol 1e-3) on the CPU interpret tier.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vattention_tpu.ops.attention_ref import decode_reference, mha_reference
from vattention_tpu.ops.cache_append import cache_append_jnp
from vattention_tpu.ops.arena_copy import apply_relocations
from vattention_tpu.ops.flash_decode import flash_decode
from vattention_tpu.ops.flash_prefill import flash_prefill

L, HKV, HQ, D = 2, 2, 4, 64
R = 2048          # arena rows
S = 8             # extent budget
BLOCK_TOKENS = 256


def make_cache(rng):
    return jnp.asarray(
        rng.standard_normal((L, 2, HKV, R, D)), dtype=jnp.float32)


def seg_tables(extents, total_pad=None):
    """extents: [(row, ntokens), ...] -> (seg_row [S], seg_cum [S+1])."""
    seg_row = np.zeros(S, np.int32)
    seg_cum = np.zeros(S + 1, np.int32)
    t = 0
    for j, (row, n) in enumerate(extents):
        seg_row[j] = row
        seg_cum[j] = t
        t += n
    for j in range(len(extents), S + 1):
        seg_cum[j] = t
    seg_cum[S] = max(t, total_pad or t)
    return jnp.asarray(seg_row), jnp.asarray(seg_cum)


def gather_kv(cache, layer, extents, n):
    """Materialize a request's logically-contiguous K/V [n, HKV, D]."""
    rows = []
    for row, m in extents:
        rows.extend(range(row, row + m))
    rows = np.array(rows[:n])
    k = np.asarray(cache[layer, 0])[:, rows].transpose(1, 0, 2)
    v = np.asarray(cache[layer, 1])[:, rows].transpose(1, 0, 2)
    return jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("extents,kv_len,q_start", [
    ([(0, 1024)], 640, 128),          # single extent, chunked continuation
    ([(0, 1024)], 512, 0),            # first chunk (pure causal)
    ([(256, 512), (1024, 512)], 900, 388),  # two extents, boundary crossing
    ([(0, 256), (512, 256), (1024, 256)], 768, 256),  # three extents
])
def test_flash_prefill_matches_reference(extents, kv_len, q_start):
    rng = np.random.default_rng(0)
    cache = make_cache(rng)
    Tq_actual = kv_len - q_start
    q_tile = 128
    Tq = -(-Tq_actual // q_tile) * q_tile
    q = jnp.asarray(rng.standard_normal((Tq, HQ, D)), dtype=jnp.float32)
    seg_row, seg_cum = seg_tables(extents)
    qinfo = jnp.array([q_start, kv_len, 1], jnp.int32)
    out = flash_prefill(q, cache, seg_row, seg_cum, qinfo,
                        q_tile=q_tile, kv_tile=256,
                        num_segments=S, max_kv_tiles=8)
    k, v = gather_kv(cache, 1, extents, kv_len)
    ref = mha_reference(q[:Tq_actual], k, v, causal=True, q_start=q_start)
    np.testing.assert_allclose(
        np.asarray(out[:Tq_actual]), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_decode_matches_reference():
    rng = np.random.default_rng(1)
    cache = make_cache(rng)
    B = 4
    per_seq_extents = [
        [(0, 512)],
        [(512, 256), (1280, 256)],
        [(768, 256)],
        [(1536, 512)],
    ]
    seqlens = np.array([500, 444, 1, 0], np.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), dtype=jnp.float32)
    seg_row = np.zeros((B, S), np.int32)
    seg_cum = np.zeros((B, S + 1), np.int32)
    for b in range(B):
        r, c = seg_tables(per_seq_extents[b])
        seg_row[b], seg_cum[b] = np.asarray(r), np.asarray(c)
    from vattention_tpu.ops.utils import tile_rows_from_segments

    tile_rows = tile_rows_from_segments(seg_row, seg_cum, 256, 4)
    out = flash_decode(q, cache, jnp.asarray(tile_rows),
                       jnp.asarray(seqlens), jnp.zeros(1, jnp.int32),
                       kv_tile=256, max_kv_tiles=4)
    # reference: gather each seq's KV into [B, maxlen, HKV, D]
    maxlen = 512
    kg = np.zeros((B, maxlen, HKV, D), np.float32)
    vg = np.zeros((B, maxlen, HKV, D), np.float32)
    for b in range(B):
        n = int(seqlens[b])
        if n:
            k, v = gather_kv(cache, 0, per_seq_extents[b], n)
            kg[b, :n], vg[b, :n] = np.asarray(k), np.asarray(v)
    ref = decode_reference(q, jnp.asarray(kg), jnp.asarray(vg),
                           jnp.asarray(seqlens))
    np.testing.assert_allclose(np.asarray(out[:3]), np.asarray(ref[:3]),
                               atol=2e-3, rtol=2e-3)
    # inactive slot must produce zeros (not NaN)
    assert np.isfinite(np.asarray(out[3])).all()


def test_cache_append_tokens_matches_scatter():
    from vattention_tpu.ops.cache_append import cache_append_tokens

    rng = np.random.default_rng(2)
    cache = make_cache(rng)
    T = 16
    k_new = jnp.asarray(rng.standard_normal((T, HKV, D)), dtype=jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((T, HKV, D)), dtype=jnp.float32)
    # batched mode contract: every valid row in a distinct 32-row window
    # (the decode invariant -- one token per slot, block-aligned extents)
    rows = np.full(T, -1, np.int32)
    rows[:8] = np.arange(100, 100 + 8 * 64, 64)
    rows[8:12] = [700, 1200, 1500, 42]
    rows = jnp.asarray(rows)
    expect = cache_append_jnp(cache, k_new, v_new, rows, 1)
    got = cache_append_tokens(cache.copy(), k_new, v_new, rows,
                              jnp.ones(1, jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))

    # serialize mode handles window-sharing rows (sub-WINDOW block sizes)
    rows2 = np.full(T, -1, np.int32)
    rows2[:8] = np.arange(100, 108)
    rows2[8:12] = [700, 300, 1500, 42]
    rows2 = jnp.asarray(rows2)
    expect2 = cache_append_jnp(cache, k_new, v_new, rows2, 1)
    got2 = cache_append_tokens(cache.copy(), k_new, v_new, rows2,
                               jnp.ones(1, jnp.int32), serialize=True)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(expect2))


def test_cache_append_run_matches_scatter():
    from vattention_tpu.ops.cache_append import WINDOW, cache_append_run

    rng = np.random.default_rng(12)
    cache = make_cache(rng)
    chunk = 100
    k_new = jnp.asarray(rng.standard_normal((chunk, HKV, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((chunk, HKV, D)), jnp.float32)
    # two extent runs with unaligned boundaries: rows 37..96, 512..551
    rows = np.concatenate([np.arange(37, 97), np.arange(512, 552)])
    rows = rows.astype(np.int32)
    expect = cache_append_jnp(cache, k_new, v_new, jnp.asarray(rows), 0)
    runinfo = np.zeros((8, 3), np.int32)
    runinfo[0] = (37, 0, 60)
    runinfo[1] = (512, 60, 40)
    pad = jnp.zeros((WINDOW, HKV, D), jnp.float32)
    got = cache_append_run(
        cache.copy(), jnp.concatenate([pad, k_new, pad]),
        jnp.concatenate([pad, v_new, pad]), jnp.asarray(runinfo),
        jnp.zeros(1, jnp.int32), max_windows=chunk // WINDOW + 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_apply_relocations_moves_blocks():
    rng = np.random.default_rng(3)
    cache = make_cache(rng)
    before = np.asarray(cache).copy()
    src = jnp.asarray([0, 1, 7], jnp.int32)
    dst = jnp.asarray([4, 5, 0], jnp.int32)
    n = jnp.asarray([2], jnp.int32)  # third move is padding, ignored
    got = np.asarray(apply_relocations(cache, src, dst, n,
                                       block_tokens=BLOCK_TOKENS))
    bt = BLOCK_TOKENS
    expect = before.copy()
    for s_, d_ in [(0, 4), (1, 5)]:
        expect[:, :, :, d_ * bt:(d_ + 1) * bt] = (
            before[:, :, :, s_ * bt:(s_ + 1) * bt])
    np.testing.assert_array_equal(got, expect)


def test_append_then_prefill_end_to_end():
    """Simulate one chunked-prefill step: append chunk KV, then attend."""
    rng = np.random.default_rng(4)
    cache = jnp.zeros((L, 2, HKV, R, D), jnp.float32)
    ctx = 384
    chunk = 128
    # history already in cache rows [0, 256); chunk rows [256, 384)
    hist_k = rng.standard_normal((ctx, HKV, D)).astype(np.float32)
    hist_v = rng.standard_normal((ctx, HKV, D)).astype(np.float32)
    cache = cache.at[0, 0, :, :ctx].set(jnp.asarray(hist_k).transpose(1, 0, 2))
    cache = cache.at[0, 1, :, :ctx].set(jnp.asarray(hist_v).transpose(1, 0, 2))
    q = jnp.asarray(rng.standard_normal((chunk, HQ, D)), dtype=jnp.float32)
    seg_row, seg_cum = seg_tables([(0, 1024)])
    qinfo = jnp.array([ctx - chunk, ctx, 0], jnp.int32)
    out = flash_prefill(q, cache, seg_row, seg_cum, qinfo,
                        q_tile=128, kv_tile=256, num_segments=S,
                        max_kv_tiles=4)
    ref = mha_reference(q, jnp.asarray(hist_k), jnp.asarray(hist_v),
                        causal=True, q_start=ctx - chunk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_pod_fused_matches_separate_kernels():
    """Fused POD kernel == separate prefill + decode kernels.

    (ref pod_attn/tests pattern: fused vs stock FA for both phases)
    """
    from vattention_tpu.ops.pod_fused import (build_pod_schedule,
                                              pod_fused_attention)

    rng = np.random.default_rng(9)
    cache = make_cache(rng)
    # prefill seq: 640 ctx, chunk 128 at q_start 512, extent at row 0
    kv_len, q_start, Tq = 640, 512, 128
    qp = jnp.asarray(rng.standard_normal((Tq, HQ, D)), dtype=jnp.float32)
    pre_row, pre_cum = seg_tables([(0, 1024)])
    # decode batch of 3 slots (one inactive)
    B = 3
    dec_extents = [[(1024, 512)], [(1536, 256)], [(0, 256)]]
    dec_seqlens = np.array([500, 200, 0], np.int32)
    qd = jnp.asarray(rng.standard_normal((B, HQ, D)), dtype=jnp.float32)
    dec_row = np.zeros((B, S), np.int32)
    dec_cum = np.zeros((B, S + 1), np.int32)
    for b in range(B):
        r, c = seg_tables(dec_extents[b])
        dec_row[b], dec_cum[b] = np.asarray(r), np.asarray(c)

    qinfo2 = np.array([[q_start, kv_len]], np.int32)
    sched = build_pod_schedule([Tq], 128, 256, qinfo2, dec_seqlens)
    assert (sched[:, 0] == 1).sum() == 3  # 2 + 1 decode tiles
    qinfo = jnp.asarray([q_start, kv_len, 1], jnp.int32)
    op, od = pod_fused_attention(
        qp, qd, cache, jnp.asarray(sched),
        jnp.asarray(np.asarray(pre_row)[None]),
        jnp.asarray(np.asarray(pre_cum)[None]),
        jnp.asarray(qinfo2), jnp.ones(1, jnp.int32),
        jnp.asarray(dec_row), jnp.asarray(dec_cum),
        jnp.asarray(dec_seqlens), q_tile=128, kv_tile=256, num_segments=S)

    ref_p = flash_prefill(qp, cache, pre_row, pre_cum, qinfo,
                          q_tile=128, kv_tile=256, num_segments=S,
                          max_kv_tiles=4)
    from vattention_tpu.ops.utils import tile_rows_from_segments

    ref_d = flash_decode(qd, cache,
                         jnp.asarray(tile_rows_from_segments(
                             dec_row, dec_cum, 256, 4)),
                         jnp.asarray(dec_seqlens),
                         jnp.ones(1, jnp.int32), kv_tile=256,
                         max_kv_tiles=4)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ref_p),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(od[:2]), np.asarray(ref_d[:2]),
                               atol=2e-3, rtol=2e-3)


def test_pod_fused_long_weave():
    """Fused POD at serving scale: 4 q-tiles x deep kv history woven
    with a 8-slot decode batch (the regime where the schedule revisits
    output blocks many times)."""
    from vattention_tpu.ops.pod_fused import (build_pod_schedule,
                                              pod_fused_attention)
    from vattention_tpu.ops.utils import tile_rows_from_segments

    rng = np.random.default_rng(17)
    cache = make_cache(rng)
    # prefill: 512-token chunk at the end of a 1024 context, extent row 0
    kv_len, q_start, Tq = 1024, 512, 512
    qp = jnp.asarray(rng.standard_normal((Tq, HQ, D)), dtype=jnp.float32)
    pre_row, pre_cum = seg_tables([(0, 1024)])
    # decode extents kv_tile-aligned (the serving contract: extents are
    # block-aligned and select_kv_tile keeps kv_tile <= block_tokens)
    B = 4
    dec_row = np.zeros((B, S), np.int32)
    dec_cum = np.zeros((B, S + 1), np.int32)
    dec_seqlens = np.zeros(B, np.int32)
    for b in range(B):
        r, c = seg_tables([(1024 + b * 256, 256)])
        dec_row[b], dec_cum[b] = np.asarray(r), np.asarray(c)
        dec_seqlens[b] = 100 + 37 * b
    qd = jnp.asarray(rng.standard_normal((B, HQ, D)), dtype=jnp.float32)

    qinfo2 = np.array([[q_start, kv_len]], np.int32)
    sched = build_pod_schedule([Tq], 128, 256, qinfo2, dec_seqlens)
    qinfo = jnp.asarray([q_start, kv_len, 1], jnp.int32)
    op, od = pod_fused_attention(
        qp, qd, cache, jnp.asarray(sched),
        jnp.asarray(np.asarray(pre_row)[None]),
        jnp.asarray(np.asarray(pre_cum)[None]),
        jnp.asarray(qinfo2), jnp.ones(1, jnp.int32),
        jnp.asarray(dec_row), jnp.asarray(dec_cum),
        jnp.asarray(dec_seqlens), q_tile=128, kv_tile=256, num_segments=S)

    ref_p = flash_prefill(qp, cache, pre_row, pre_cum, qinfo,
                          q_tile=128, kv_tile=256, num_segments=S,
                          max_kv_tiles=4)
    ref_d = flash_decode(qd, cache,
                         jnp.asarray(tile_rows_from_segments(
                             dec_row, dec_cum, 256, 4)),
                         jnp.asarray(dec_seqlens), jnp.ones(1, jnp.int32),
                         kv_tile=256, max_kv_tiles=4)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ref_p),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(od), np.asarray(ref_d),
                               atol=2e-3, rtol=2e-3)


def test_pod_fused_multi_prefill():
    """Multi-run POD: 2 prefill runs (different depths/extents) + a
    decode batch fuse into one launch; each run must match the serial
    prefill kernel on its own geometry."""
    from vattention_tpu.ops.pod_fused import (build_pod_schedule,
                                              pod_fused_attention)
    from vattention_tpu.ops.utils import tile_rows_from_segments

    rng = np.random.default_rng(23)
    cache = make_cache(rng)
    K = 2
    # run 0: 256-chunk at the end of a 768 ctx, extent at row 0;
    # run 1: 130-chunk (pads to 256) first chunk of a 384 ctx
    runs = [
        dict(chunk=256, kv_len=768, q_start=512, extents=[(0, 1024)]),
        dict(chunk=130, kv_len=384, q_start=254,
             extents=[(1024, 256), (1280, 256)]),
    ]
    pre_row = np.zeros((K, S), np.int32)
    pre_cum = np.zeros((K, S + 1), np.int32)
    qinfo = np.zeros((K, 2), np.int32)
    q_parts, offs = [], []
    off = 0
    for r, spec in enumerate(runs):
        rr, cc = seg_tables(spec["extents"])
        pre_row[r], pre_cum[r] = np.asarray(rr), np.asarray(cc)
        qinfo[r] = (spec["q_start"], spec["kv_len"])
        pad = -(-spec["chunk"] // 128) * 128
        q_parts.append(rng.standard_normal((pad, HQ, D)))
        offs.append(off)
        off += pad
    qp = jnp.asarray(np.concatenate(q_parts), jnp.float32)

    B = 2
    dec_row = np.zeros((B, S), np.int32)
    dec_cum = np.zeros((B, S + 1), np.int32)
    dec_seqlens = np.array([300, 128], np.int32)
    for b in range(B):
        rr, cc = seg_tables([(1536 + b * 256, 256)])
        dec_row[b], dec_cum[b] = np.asarray(rr), np.asarray(cc)
    qd = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.float32)

    sched = build_pod_schedule([r["chunk"] for r in runs], 128, 256,
                               qinfo, dec_seqlens)
    op, od = pod_fused_attention(
        qp, qd, cache, jnp.asarray(sched), jnp.asarray(pre_row),
        jnp.asarray(pre_cum), jnp.asarray(qinfo),
        jnp.ones(1, jnp.int32), jnp.asarray(dec_row),
        jnp.asarray(dec_cum), jnp.asarray(dec_seqlens),
        q_tile=128, kv_tile=256, num_segments=S)

    for r, spec in enumerate(runs):
        qinfo3 = jnp.asarray(
            [spec["q_start"], spec["kv_len"], 1], jnp.int32)
        pad = -(-spec["chunk"] // 128) * 128
        ref_p = flash_prefill(
            qp[offs[r]:offs[r] + pad], cache,
            jnp.asarray(pre_row[r]), jnp.asarray(pre_cum[r]), qinfo3,
            q_tile=128, kv_tile=256, num_segments=S, max_kv_tiles=4)
        np.testing.assert_allclose(
            np.asarray(op[offs[r]:offs[r] + spec["chunk"]]),
            np.asarray(ref_p[:spec["chunk"]]),
            atol=2e-3, rtol=2e-3, err_msg=f"run {r}")
    ref_d = flash_decode(qd, cache,
                         jnp.asarray(tile_rows_from_segments(
                             dec_row, dec_cum, 256, 4)),
                         jnp.asarray(dec_seqlens), jnp.ones(1, jnp.int32),
                         kv_tile=256, max_kv_tiles=4)
    np.testing.assert_allclose(np.asarray(od), np.asarray(ref_d),
                               atol=2e-3, rtol=2e-3)


def test_sliding_window_attention():
    """Window-masked kernels vs explicitly masked jnp reference."""
    rng = np.random.default_rng(21)
    cache = make_cache(rng)
    window = 300
    # prefill continuation with window
    kv_len, q_start = 640, 512
    Tq = 128
    q = jnp.asarray(rng.standard_normal((Tq, HQ, D)), dtype=jnp.float32)
    seg_row, seg_cum = seg_tables([(0, 1024)])
    qinfo = jnp.asarray([q_start, kv_len, 0], jnp.int32)
    out = flash_prefill(q, cache, seg_row, seg_cum, qinfo, q_tile=128,
                        kv_tile=256, num_segments=S, max_kv_tiles=4,
                        window=window)
    k, v = gather_kv(cache, 0, [(0, 1024)], kv_len)

    def ref_windowed(q, k, v, q_start, window):
        Tq = q.shape[0]
        Tk = k.shape[0]
        G = HQ // HKV
        qf = q.astype(jnp.float32).reshape(Tq, HKV, G, D)
        scores = jnp.einsum("qhgd,khd->hgqk", qf,
                            k.astype(jnp.float32)) / (D ** 0.5)
        q_pos = q_start + jnp.arange(Tq)[:, None]
        k_pos = jnp.arange(Tk)[None, :]
        mask = (q_pos >= k_pos) & (k_pos > q_pos - window)
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hgqk,khd->qhgd", p, v.astype(jnp.float32))
        return o.reshape(Tq, HQ, D)

    ref = ref_windowed(q, k, v, q_start, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)

    # decode with window
    B = 2
    qd = jnp.asarray(rng.standard_normal((B, HQ, D)), dtype=jnp.float32)
    seqlens = jnp.asarray([500, 120], jnp.int32)
    from vattention_tpu.ops.utils import tile_rows_from_segments

    seg_row_b = np.tile(np.asarray(seg_row)[None], (B, 1))
    seg_cum_b = np.tile(np.asarray(seg_cum)[None], (B, 1))
    outd = flash_decode(qd, cache,
                        jnp.asarray(tile_rows_from_segments(
                            seg_row_b, seg_cum_b, 256, 4)),
                        seqlens,
                        jnp.zeros(1, jnp.int32), kv_tile=256,
                        max_kv_tiles=4, window=window)
    for b in range(B):
        n = int(seqlens[b])
        lo = max(0, n - window)
        kb, vb = k[lo:n], v[lo:n]
        ref_b = mha_reference(qd[b:b+1], kb, vb, causal=False)
        np.testing.assert_allclose(np.asarray(outd[b:b+1]),
                                   np.asarray(ref_b),
                                   atol=2e-3, rtol=2e-3)


def test_paged_flash_prefill_matches_reference():
    """Paged (block-table) prefill vs naive reference (ADVICE r1: the
    paged kernels previously had no kernel-level coverage)."""
    from vattention_tpu.ops.paged_attention import paged_flash_prefill

    rng = np.random.default_rng(31)
    cache = make_cache(rng)
    block_size = 256
    # blocks scattered through the arena, deliberately out of order
    table = np.array([3, 0, 6, 1], np.int32)
    kv_len, q_start = 900, 388          # non-tile-aligned continuation
    q_tile = 128
    Tq = -(-(kv_len - q_start) // q_tile) * q_tile
    q = jnp.asarray(rng.standard_normal((Tq, HQ, D)), dtype=jnp.float32)
    qinfo = jnp.asarray([q_start, kv_len, 1], jnp.int32)
    out = paged_flash_prefill(q, cache, jnp.asarray(table), qinfo,
                              q_tile=q_tile, block_size=block_size)
    extents = [(int(b) * block_size, block_size) for b in table]
    k, v = gather_kv(cache, 1, extents, kv_len)
    Tq_actual = kv_len - q_start
    ref = mha_reference(q[:Tq_actual], k, v, causal=True, q_start=q_start)
    np.testing.assert_allclose(np.asarray(out[:Tq_actual]),
                               np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_paged_flash_decode_matches_reference():
    from vattention_tpu.ops.paged_attention import paged_flash_decode

    rng = np.random.default_rng(32)
    cache = make_cache(rng)
    block_size = 256
    B, NB = 4, 3
    table = np.array([[2, 5, 1],
                      [7, 0, 0],
                      [4, 6, 3],
                      [0, 0, 0]], np.int32)
    # non-tile-aligned, single-token, and zero-length (inactive) slots
    seqlens = np.array([700, 1, 300, 0], np.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), dtype=jnp.float32)
    out = paged_flash_decode(q, cache, jnp.asarray(table),
                             jnp.asarray(seqlens), jnp.zeros(1, jnp.int32),
                             block_size=block_size)
    maxlen = NB * block_size
    kg = np.zeros((B, maxlen, HKV, D), np.float32)
    vg = np.zeros((B, maxlen, HKV, D), np.float32)
    for b in range(B):
        n = int(seqlens[b])
        if n:
            extents = [(int(blk) * block_size, block_size)
                       for blk in table[b]]
            k, v = gather_kv(cache, 0, extents, n)
            kg[b, :n], vg[b, :n] = np.asarray(k), np.asarray(v)
    ref = decode_reference(q, jnp.asarray(kg), jnp.asarray(vg),
                           jnp.asarray(seqlens))
    active = seqlens > 0
    np.testing.assert_allclose(np.asarray(out[active]),
                               np.asarray(ref[active]),
                               atol=2e-3, rtol=2e-3)
    assert np.isfinite(np.asarray(out[~active])).all()


def test_flash_prefill_multi_matches_reference():
    """K prefill runs in one launch == K single-run calls."""
    from vattention_tpu.ops.flash_prefill import flash_prefill_multi

    rng = np.random.default_rng(7)
    cache = make_cache(rng)
    q_tile = 128
    # three runs with different extents, chunk lengths and histories;
    # run 1's chunk is not a q_tile multiple (padded region)
    runs = [
        dict(extents=[(0, 512)], kv_len=512, q_start=256, chunk=256),
        dict(extents=[(512, 256), (1280, 256)], kv_len=450, q_start=350,
             chunk=100),
        dict(extents=[(768, 256)], kv_len=256, q_start=0, chunk=256),
    ]
    K = len(runs)
    seg_row = np.zeros((K, S), np.int32)
    seg_cum = np.zeros((K, S + 1), np.int32)
    qinfo = np.zeros((K, 2), np.int32)
    qt_run = []
    q_parts, offs = [], []
    off = 0
    for r, spec in enumerate(runs):
        sr, sc = seg_tables(spec["extents"])
        seg_row[r], seg_cum[r] = np.asarray(sr), np.asarray(sc)
        qinfo[r] = (spec["q_start"], spec["kv_len"])
        pad = -(-spec["chunk"] // q_tile) * q_tile
        q_parts.append(rng.standard_normal((pad, HQ, D)))
        offs.append(off)
        for lqt in range(pad // q_tile):
            qt_run.append((r, lqt))
        off += pad
    q = jnp.asarray(np.concatenate(q_parts), jnp.float32)
    out = flash_prefill_multi(
        q, cache, jnp.asarray(seg_row), jnp.asarray(seg_cum),
        jnp.asarray(qinfo), jnp.asarray(np.array(qt_run, np.int32)),
        jnp.asarray([1], jnp.int32), q_tile=q_tile, kv_tile=256,
        num_segments=S, max_kv_tiles=8)
    for r, spec in enumerate(runs):
        k, v = gather_kv(cache, 1, spec["extents"], spec["kv_len"])
        ref = mha_reference(
            q[offs[r]:offs[r] + spec["chunk"]], k, v, causal=True,
            q_start=spec["q_start"])
        np.testing.assert_allclose(
            np.asarray(out[offs[r]:offs[r] + spec["chunk"]]),
            np.asarray(ref), atol=2e-3, rtol=2e-3,
            err_msg=f"run {r}")


def test_paged_flash_prefill_multi_matches_reference():
    from vattention_tpu.ops.paged_attention import paged_flash_prefill_multi

    rng = np.random.default_rng(8)
    cache = make_cache(rng)
    q_tile = 128
    BT = 256
    # per-run block tables over the shared pool
    runs = [
        dict(blocks=[0, 3, 5], kv_len=700, q_start=400, chunk=300),
        dict(blocks=[1, 2], kv_len=384, q_start=0, chunk=384),
    ]
    K = len(runs)
    NB = max(len(r["blocks"]) for r in runs)
    tables = np.zeros((K, NB), np.int32)
    qinfo = np.zeros((K, 2), np.int32)
    qt_run, q_parts, offs = [], [], []
    off = 0
    for r, spec in enumerate(runs):
        tables[r, :len(spec["blocks"])] = spec["blocks"]
        qinfo[r] = (spec["q_start"], spec["kv_len"])
        pad = -(-spec["chunk"] // q_tile) * q_tile
        q_parts.append(rng.standard_normal((pad, HQ, D)))
        offs.append(off)
        for lqt in range(pad // q_tile):
            qt_run.append((r, lqt))
        off += pad
    q = jnp.asarray(np.concatenate(q_parts), jnp.float32)
    out = paged_flash_prefill_multi(
        q, cache, jnp.asarray(tables), jnp.asarray(qinfo),
        jnp.asarray(np.array(qt_run, np.int32)),
        jnp.asarray([0], jnp.int32), q_tile=q_tile, block_size=BT,
        max_kv_tiles=NB)
    for r, spec in enumerate(runs):
        extents = [(b * BT, BT) for b in spec["blocks"]]
        k, v = gather_kv(cache, 0, extents, spec["kv_len"])
        ref = mha_reference(
            q[offs[r]:offs[r] + spec["chunk"]], k, v, causal=True,
            q_start=spec["q_start"])
        np.testing.assert_allclose(
            np.asarray(out[offs[r]:offs[r] + spec["chunk"]]),
            np.asarray(ref), atol=2e-3, rtol=2e-3,
            err_msg=f"run {r}")


def _run_packed_upcast(exact):
    from jax.experimental import pallas as pl

    from vattention_tpu.ops.utils import upcast_kv_packed

    def kern(x_ref, o_ref):
        o_ref[:] = upcast_kv_packed(x_ref[:], jnp.bfloat16, exact=exact)

    bits = np.tile(np.arange(256, dtype=np.uint8).reshape(2, 128),
                   (16, 1))  # [32, 128], every pattern
    x = jax.lax.bitcast_convert_type(jnp.asarray(bits.astype(np.int8)),
                                     jnp.float8_e4m3fn)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.bfloat16),
        interpret=True,
    )(x)
    got = np.asarray(out, np.float32)
    ref = np.asarray(x.astype(jnp.float32))
    return got, ref


def test_upcast_kv_packed_exact_all_fp8_patterns():
    """ops/utils.upcast_kv_packed (exact=True): bit-exact vs astype on
    all finite e4m3 patterns, with the documented even-then-odd order."""
    got, ref = _run_packed_upcast(exact=True)
    finite = ~np.isnan(ref)
    # row order: first half = even source rows, second half = odd
    assert np.array_equal(got[:16][finite[0::2]], ref[0::2][finite[0::2]])
    assert np.array_equal(got[16:][finite[1::2]], ref[1::2][finite[1::2]])


def test_upcast_kv_packed_fast_normals_and_zero():
    """The fast path (exact=False, the serving default) must be exact on
    every NORMAL pattern and +-0; denormal patterns decode to their
    value or zero depending on platform flush, and never occur in the
    arena (the append path flushes them at write time)."""
    got, ref = _run_packed_upcast(exact=False)
    bits = np.tile(np.arange(256, dtype=np.uint8).reshape(2, 128),
                   (16, 1))
    exp = (bits >> 3) & 0xF
    is_denorm = (exp == 0) & ((bits & 0x7) != 0)
    check = ~np.isnan(ref) & ~is_denorm      # normals and +-0
    assert np.array_equal(got[:16][check[0::2]], ref[0::2][check[0::2]])
    assert np.array_equal(got[16:][check[1::2]], ref[1::2][check[1::2]])
    # denormal patterns: value-exact or flushed to zero, nothing else
    d = is_denorm[0::2]
    ok = (got[:16][d] == ref[0::2][d]) | (got[:16][d] == 0.0)
    assert ok.all()


def test_flash_decode_fp8_packed_matches_unpacked():
    """The packed fp8 widening permutes KV rows within a tile; with the
    mask remap (packed_kv_pos) decode must agree with the unpacked path
    to accumulation-order noise, including odd in-tile boundaries."""
    rng = np.random.default_rng(7)
    raw = rng.standard_normal((L, 2, HKV, R, D))
    raw[np.abs(raw) < 15 * 2.0 ** -10] = 0.0  # write-flush contract
    cache = jnp.asarray(raw, jnp.float32).astype(jnp.float8_e4m3fn)
    B = 4
    per_seq_extents = [
        [(0, 512)],
        [(512, 256), (1280, 256)],
        [(768, 256)],
        [(1536, 512)],
    ]
    # odd / non-multiple-of-tile lengths stress the permuted mask edge
    seqlens = np.array([501, 443, 1, 257], np.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
    seg_row = np.zeros((B, S), np.int32)
    seg_cum = np.zeros((B, S + 1), np.int32)
    for b in range(B):
        r, c = seg_tables(per_seq_extents[b])
        seg_row[b], seg_cum[b] = np.asarray(r), np.asarray(c)
    from vattention_tpu.ops.utils import tile_rows_from_segments

    tile_rows = jnp.asarray(
        tile_rows_from_segments(seg_row, seg_cum, 256, 4))
    outs = {}
    for packed in (False, True):
        outs[packed] = np.asarray(flash_decode(
            q, cache, tile_rows, jnp.asarray(seqlens),
            jnp.zeros(1, jnp.int32), kv_tile=256, max_kv_tiles=4,
            fp8_packed=packed), np.float32)
    assert np.isfinite(outs[True]).all()
    np.testing.assert_allclose(outs[True], outs[False],
                               atol=1e-3, rtol=1e-3)


def test_flash_prefill_fp8_packed_matches_unpacked():
    """Causal + length masks under the packed row permutation."""
    rng = np.random.default_rng(8)
    raw = rng.standard_normal((L, 2, HKV, R, D))
    raw[np.abs(raw) < 15 * 2.0 ** -10] = 0.0  # write-flush contract
    cache = jnp.asarray(raw, jnp.float32).astype(jnp.float8_e4m3fn)
    extents, kv_len, q_start = [(256, 512), (1024, 512)], 899, 388
    q_tile = 128
    Tq_actual = kv_len - q_start
    Tq = -(-Tq_actual // q_tile) * q_tile
    q = jnp.asarray(rng.standard_normal((Tq, HQ, D)), jnp.bfloat16)
    seg_row, seg_cum = seg_tables(extents)
    qinfo = jnp.array([q_start, kv_len, 1], jnp.int32)
    outs = {}
    for packed in (False, True):
        outs[packed] = np.asarray(flash_prefill(
            q, cache, seg_row, seg_cum, qinfo, q_tile=q_tile,
            kv_tile=256, num_segments=S, max_kv_tiles=8,
            fp8_packed=packed)[:Tq_actual], np.float32)
    assert np.isfinite(outs[True]).all()
    np.testing.assert_allclose(outs[True], outs[False],
                               atol=1e-3, rtol=1e-3)


def test_upcast_kv_exact_all_fp8_patterns():
    """ops/utils.upcast_kv must reproduce astype exactly for every
    finite e4m3 bit pattern (NaN excluded by contract: the append path
    only stores saturated finite values)."""
    from vattention_tpu.ops.utils import upcast_kv

    bits = np.arange(256, dtype=np.uint8)
    x = jax.lax.bitcast_convert_type(
        jnp.asarray(bits), jnp.float8_e4m3fn)
    for dt in (jnp.bfloat16, jnp.float32):
        ref = np.asarray(x.astype(dt), np.float32)
        got = np.asarray(upcast_kv(x, dt), np.float32)
        mismatch = (ref != got) & ~np.isnan(ref)
        assert not mismatch.any(), np.nonzero(mismatch)
    # non-fp8 inputs pass through astype unchanged
    y = jnp.asarray([1.5, -2.0], jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(upcast_kv(y, jnp.float32)),
        np.asarray(y.astype(jnp.float32)))


def test_paged_prefill_multi_small_blocks_kv_fetch():
    """fi_paged_16-analog path: tiny blocks with kv_fetch > 1 (several
    block-table-resolved DMAs per compute tile) must match reference."""
    from vattention_tpu.ops.paged_attention import paged_flash_prefill_multi

    rng = np.random.default_rng(9)
    cache = make_cache(rng)
    q_tile = 128
    BT = 32
    kv_fetch = 8  # kv_tile = 256
    runs = [
        dict(blocks=list(rng.permutation(40)[:22]), kv_len=700,
             q_start=400, chunk=300),
        dict(blocks=list(rng.permutation(40)[:12]), kv_len=384,
             q_start=0, chunk=384),
    ]
    K = len(runs)
    NB = max(len(r["blocks"]) for r in runs)
    tables = np.zeros((K, NB), np.int32)
    qinfo = np.zeros((K, 2), np.int32)
    qt_run, q_parts, offs = [], [], []
    off = 0
    for r, spec in enumerate(runs):
        tables[r, :len(spec["blocks"])] = spec["blocks"]
        qinfo[r] = (spec["q_start"], spec["kv_len"])
        pad = -(-spec["chunk"] // q_tile) * q_tile
        q_parts.append(rng.standard_normal((pad, HQ, D)))
        offs.append(off)
        for lqt in range(pad // q_tile):
            qt_run.append((r, lqt))
        off += pad
    q = jnp.asarray(np.concatenate(q_parts), jnp.float32)
    out = paged_flash_prefill_multi(
        q, cache, jnp.asarray(tables), jnp.asarray(qinfo),
        jnp.asarray(np.array(qt_run, np.int32)),
        jnp.asarray([0], jnp.int32), q_tile=q_tile, block_size=BT,
        max_kv_tiles=-(-NB // kv_fetch), kv_fetch=kv_fetch)
    for r, spec in enumerate(runs):
        extents = [(b * BT, BT) for b in spec["blocks"]]
        k, v = gather_kv(cache, 0, extents, spec["kv_len"])
        ref = mha_reference(
            q[offs[r]:offs[r] + spec["chunk"]], k, v, causal=True,
            q_start=spec["q_start"])
        np.testing.assert_allclose(
            np.asarray(out[offs[r]:offs[r] + spec["chunk"]]),
            np.asarray(ref), atol=2e-3, rtol=2e-3,
            err_msg=f"run {r}")
