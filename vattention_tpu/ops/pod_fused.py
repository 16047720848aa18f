"""POD-Attention: fused prefill+decode in one Pallas kernel launch.

ref: pod_attn/ (FA-2.6.1 fork, ~9.9k LoC).  The reference fuses both
phases into one CUDA kernel so prefill (compute-bound) and decode
(memory-bound) CTAs share every SM, balanced at runtime by an SM-aware
scheduler (`compute_fused_tb_attn`, fused_fwd_kernel.h:1412-1510, atomics
on a tbAssign scratch; host heuristics fused_api.cpp:357-375).

TPU re-design: a TPU core executes grid steps sequentially but the Pallas
pipeline double-buffers each step's DMAs against the previous step's
compute.  Fusing both phases into ONE grid and *interleaving* decode
tiles between prefill tiles therefore hides decode's KV fetches (pure
HBM traffic) under prefill's MXU work -- the same overlap POD gets from
SM sharing.  The interleave order is a host-built schedule array handed
to the kernel via scalar prefetch (the tbAssign analog):

  sched[t] = (phase, lqt|b, kt, run, cur_gqt, first, pre_state,
              parity, next-decode links...)   -- see build_pod_schedule

Multi-prefill: every prefill run in a mixed step fuses into the same
launch (per-run (q_start, kv_len) read from a [K,2] qinfo table; the
reference wrapper's single-prefill limit, pod_wrapper.py:74-75, is a
CUDA grid-shape constraint TPU does not share).

Per-slot decode softmax state lives in [B]-indexed VMEM scratch so the
two streams can interleave at single-tile granularity; the prefill
stream keeps one (m, l, acc) set because its tiles run in (qt, kt)
row-major order.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vattention_tpu.ops.utils import (MASK_VALUE, cdiv, icdiv, idiv,
                                      interpret_mode,
                                      tile_rows_from_segments_jnp,
                                      tpu_params, upcast_kv)


# Maximum prefill KV depth validated for the fused kernel on hardware.
# Round 2 capped this at 1024 (Mosaic faulted); round 3's fixes
# (precomputed row tables, manual decode DMAs) moved it to 8K; the
# residual >=16K failure was NOT a Mosaic fault but an SMEM overflow:
# the 2-D s32[n,16] schedule operand gets its trailing dim padded to
# 128 lanes (8x), blowing the 1MB SMEM budget once n reached 2048.
# The schedule is now stored flat; scripts/probe_pod_depth.py validates
# 16K/32K/64K/128K (incl. chunk 2048 / kv_tile 512 serving shapes)
# bit-matching the serial kernels on v5e.  The serving path still falls
# back to serial kernels beyond this validated boundary.
POD_KV_LEN_LIMIT = 131072


# col-6 run/kt packing: the prefill KV index map unpacks r*PRE_PACK+kt
# and reads the flattened per-run row table (kt < PRE_PACK always:
# 200K max ctx / 256-token tiles = 800)
PRE_PACK = 4096


def build_pod_schedule(
    chunks,                  # per-run REAL prefill token counts
    q_tile: int, kv_tile: int,
    qinfos,                  # [K, 2] per-run (q_start, kv_len)
    dec_seqlens: np.ndarray,
    *, ratio_hint: int | None = None,
) -> np.ndarray:
    """Host-side tile scheduler (ref fused_api.cpp:357-375 heuristics).

    Emits each run's prefill tiles in (run, qt, kt) order with decode
    tiles woven in at a ratio that spreads the decode stream evenly
    across the prefill stream (runtime analog of the SM ratio
    balancing; `ratio_hint` overrides, mirroring fused_params 9 vs 11).
    Runs sit q_tile-aligned in the q region (the model runner pads each
    chunk to the q tile), so run r's global q-tile index is its padded
    offset; multi-prefill steps fuse every run plus the decode batch
    into ONE launch (the reference wrapper is single-prefill only,
    pod_wrapper.py:74-75 -- TPU has no reason to keep that limit).
    """
    pre_tiles = []
    gqt0 = 0
    for r, chunk in enumerate(chunks):
        q_start, kv_len = int(qinfos[r][0]), int(qinfos[r][1])
        n_qt = cdiv(max(int(chunk), 1), q_tile)
        for lqt in range(n_qt):
            q_last = q_start + (lqt + 1) * q_tile - 1
            n_kt = min(cdiv(kv_len, kv_tile), q_last // kv_tile + 1)
            for kt in range(max(n_kt, 1)):
                pre_tiles.append((r, lqt, gqt0 + lqt, kt, kt == 0))
        gqt0 += n_qt
    dec_tiles = []
    for b, sl in enumerate(dec_seqlens):
        for kt in range(cdiv(int(sl), kv_tile)):
            dec_tiles.append((b, kt, kt == 0))

    np_, nd = len(pre_tiles), len(dec_tiles)
    n = np_ + nd
    # pad to a pow2 bucket with no-op entries (phase 2) so the schedule
    # length -- a static kernel dimension -- does not recompile per
    # step; past 2048 entries pad to multiples of 2048 instead (pow2
    # doubling would waste up to half the grid in no-op steps exactly
    # where steps are longest)
    padded = 1
    while padded < max(n, 1) and padded < 2048:
        padded *= 2
    if n > padded:
        padded = cdiv(n, 2048) * 2048
    # columns: 0 phase, 1 lqt (prefill, for the causal mask) or b
    # (decode), 2 kt, 3 run, 4 cur global qt (drives the q/out
    # BlockSpecs; the most recent prefill tile's global q-tile, held
    # constant through decode entries so their DMAs are elided),
    # 5 first (kv tile 0 of this (run, qt) / slot stream),
    # 6 prefill-stream KV state r*PRE_PACK+kt (held through decode
    #   entries for the same elision),
    # 7 parity (decode ordinal & 1 -> double-buffer slot),
    # 8 nxt_b / 9 nxt_kt / 10 nxt_valid (the NEXT decode tile, whose
    #   manual DMA this entry launches into the other buffer),
    # 11-13 on entry 0 only: first decode tile (b, kt, any) whose DMA
    #   launches at t == 0
    sched = np.zeros((padded, 16), np.int32)
    cur_gqt, cur_pre = 0, 0
    pi = di = 0
    dec_entry_rows = []
    for t in range(n):
        # even weave: emit a decode tile whenever its stream falls behind
        # the target ratio (ref SM ratio balancing); ratio_hint biases
        # toward more decode slots per prefill tile (fused_params 9 / 11)
        if ratio_hint is not None:
            behind = di * ratio_hint < pi
        else:
            behind = di * max(np_, 1) <= pi * max(nd, 1)
        take_decode = (di < nd) and (pi >= np_ or behind)
        if take_decode:
            b, kt, first = dec_tiles[di]
            sched[t, :8] = (1, b, kt, 0, cur_gqt, int(first),
                            cur_pre, di & 1)
            dec_entry_rows.append(t)
            di += 1
        else:
            r, lqt, gqt, kt, first = pre_tiles[pi]
            pi += 1
            cur_gqt = gqt
            cur_pre = r * PRE_PACK + kt
            sched[t, :8] = (0, lqt, kt, r, cur_gqt, int(first),
                            cur_pre, 0)
    for t in range(n, padded):
        sched[t, :8] = (2, 0, 0, 0, cur_gqt, 0, cur_pre, 0)
    # decode DMA pipelining links
    for i, t in enumerate(dec_entry_rows):
        if i + 1 < len(dec_entry_rows):
            nt = dec_entry_rows[i + 1]
            sched[t, 8:11] = (sched[nt, 1], sched[nt, 2], 1)
    if dec_entry_rows:
        t0 = dec_entry_rows[0]
        sched[0, 11:14] = (sched[t0, 1], sched[t0, 2], 1)
    return sched


def _pod_kernel(
    # scalar prefetch
    sched_ref, pre_rows_ref, dec_rows_ref, qinfo_ref, linfo_ref,
    dec_seqlens_ref,
    # blocks
    qp_ref, qd_ref, kp_ref, vp_ref, kv_any_ref, op_ref, od_ref,
    # scratch
    pm_ref, pl_ref, pacc_ref, dm_ref, dl_ref, dacc_ref,
    kbuf, vbuf, ksem, vsem,
    *, q_tile: int, kv_tile: int, num_segments: int, sm_scale: float,
):
    t = pl.program_id(0)
    layer = linfo_ref[0]

    # the schedule lives in SMEM as a FLAT [padded*16] array: a 2-D
    # s32[n,16] scalar operand gets its trailing dim padded to 128
    # lanes (an 8x SMEM blowup that overflowed the 1MB budget at 64K
    # depth, VERDICT r4 #2); flat arrays pad only the total length
    def sc(tt, c):
        return sched_ref[tt * 16 + c]

    def dec_copies(b, kt, slot):
        """K/V async-copy descriptors for decode tile (b, kt) into
        double-buffer slot.  The decode stream's KV moves with MANUAL
        DMAs: the BlockSpec pipeline machinery miscompiles this stream's
        strided revisit pattern (hardware aborts once decode extents sit
        >=1024 rows apart -- bisected via kernel ablation on v5e, see
        docs/PERF.md), and the hand-rolled chain is also exactly the
        double-buffered overlap we want: each decode tile's launch is
        issued one weave-slot early, riding under prefill MXU work."""
        # serving extents are block-aligned (blocks are 32-row multiples)
        # with kv_tile <= block_tokens, so row is 32-aligned and
        # row + kv_tile <= R always holds; the clamp only guards a
        # contract violation from turning into an out-of-range DMA, and
        # multiple_of hands Mosaic the sublane-tiling divisibility proof
        # the dynamic slice needs
        row = jnp.minimum(dec_rows_ref[b, kt],
                          kv_any_ref.shape[3] - kv_tile)
        row = pl.multiple_of(row, 32)
        return (
            pltpu.make_async_copy(
                kv_any_ref.at[layer, 0, :, pl.ds(row, kv_tile), :],
                kbuf.at[slot], ksem.at[slot]),
            pltpu.make_async_copy(
                kv_any_ref.at[layer, 1, :, pl.ds(row, kv_tile), :],
                vbuf.at[slot], vsem.at[slot]),
        )

    @pl.when(jnp.logical_and(t == 0, sc(0, 13) == 1))
    def _prime_decode_stream():
        kc, vc = dec_copies(sc(0, 11), sc(0, 12), 0)
        kc.start()
        vc.start()
    phase = sc(t, 0)
    idx = sc(t, 1)
    kt = sc(t, 2)
    first = sc(t, 5)

    @pl.when(phase == 0)
    def _prefill():
        Hkv, G, _, D = qp_ref.shape
        # per-run prefill geometry (qinfo is a flat [K*2] SMEM array)
        r = sc(t, 3)
        q_start = qinfo_ref[r * 2]
        kv_len = qinfo_ref[r * 2 + 1]

        @pl.when(first == 1)
        def _init():
            pm_ref[...] = jnp.full_like(pm_ref, -jnp.inf)
            pl_ref[...] = jnp.zeros_like(pl_ref)
            pacc_ref[...] = jnp.zeros_like(pacc_ref)

        q = qp_ref[...].reshape(Hkv, G * q_tile, D)
        k = kp_ref[...]
        # compute-dtype matmul (bf16 MXU, f32 accumulate); fp8 upcasts
        # via manual widening (ops/utils.upcast_kv)
        k = upcast_kv(k, q.dtype)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale
        row = jax.lax.broadcasted_iota(jnp.int32, (G * q_tile, kv_tile), 0)
        q_pos = q_start + idx * q_tile + row % q_tile
        kv_pos = (kt * kv_tile + jax.lax.broadcasted_iota(
            jnp.int32, (G * q_tile, kv_tile), 1))
        mask = jnp.logical_and(q_pos >= kv_pos, kv_pos < kv_len)
        s = jnp.where(mask[None], s, MASK_VALUE)
        m_prev = pm_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m_prev - m_new)
        pl_ref[...] = pl_ref[...] * alpha + jnp.sum(p, axis=-1)
        v = upcast_kv(vp_ref[...], q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        pacc_ref[...] = pacc_ref[...] * alpha[..., None] + pv
        pm_ref[...] = m_new

        # write the running normalized output EVERY tile (the last tile's
        # write wins; the block only leaves VMEM when its index moves).
        # A write gated on the dynamic last tile was one suspect for the
        # deep-stream Mosaic fault; unconditional writes also keep the
        # output block defined on every visited step.
        l = pl_ref[...]
        l = jnp.where(l == 0.0, 1.0, l)
        o = pacc_ref[...] / l[..., None]
        op_ref[...] = o.reshape(Hkv, G, q_tile, D).astype(op_ref.dtype)

    @pl.when(t == 0)
    def _zero_od():
        # inactive slots are never written; keep them finite
        od_ref[...] = jnp.zeros_like(od_ref)

    @pl.when(phase == 1)
    def _decode():
        _, Hq, D = qd_ref.shape
        Hkv = kbuf.shape[1]
        G = Hq // Hkv
        b = idx
        slot = sc(t, 7)

        # this tile's K/V landed in buf[slot] (launched at t==0 or by
        # the previous decode entry); wait, then launch the next tile's
        # into the other slot before computing
        kc, vc = dec_copies(b, kt, slot)
        kc.wait()
        vc.wait()

        @pl.when(sc(t, 10) == 1)
        def _launch_next():
            nk, nv = dec_copies(sc(t, 8), sc(t, 9),
                                1 - slot)
            nk.start()
            nv.start()

        @pl.when(first == 1)
        def _init():
            dm_ref[b] = jnp.full_like(dm_ref[b], -jnp.inf)
            dl_ref[b] = jnp.zeros_like(dl_ref[b])
            dacc_ref[b] = jnp.zeros_like(dacc_ref[b])

        q = qd_ref[b].reshape(Hkv, G, D)
        k = upcast_kv(kbuf[slot], q.dtype)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * sm_scale
        kv_len_b = dec_seqlens_ref[b]
        kv_pos = kt * kv_tile + jax.lax.broadcasted_iota(
            jnp.int32, (G, kv_tile), 1)
        s = jnp.where((kv_pos < kv_len_b)[None], s, MASK_VALUE)
        m_prev = dm_ref[b]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m_prev - m_new)
        dl_ref[b] = dl_ref[b] * alpha + jnp.sum(p, axis=-1)
        v = upcast_kv(vbuf[slot], q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dacc_ref[b] = dacc_ref[b] * alpha[..., None] + pv
        dm_ref[b] = m_new

        ld = dl_ref[b]
        ld = jnp.where(ld == 0.0, 1.0, ld)
        o = dacc_ref[b] / ld[..., None]
        od_ref[b] = o.reshape(Hq, D).astype(od_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("q_tile", "kv_tile", "num_segments", "sm_scale",
                     "n_sched"))
def pod_fused_attention(
    q_prefill: jax.Array,    # [Tq, Hq, D]
    q_decode: jax.Array,     # [B, Hq, D]
    kv_cache: jax.Array,     # [L, 2, Hkv, R, D]
    sched: jax.Array,        # [n_sched, 16] int32 (host-built schedule)
    pre_seg_row: jax.Array,  # [K, S] per-run extent rows
    pre_seg_cum: jax.Array,  # [K, S+1]
    qinfo: jax.Array,        # [K, 2] per-run (q_start, kv_len)
    linfo: jax.Array,        # [1] (layer,)
    dec_seg_row: jax.Array,  # [B, S]
    dec_seg_cum: jax.Array,  # [B, S+1]
    dec_seqlens: jax.Array,  # [B]
    *,
    q_tile: int = 128,
    kv_tile: int = 256,
    num_segments: int = 8,
    sm_scale: float | None = None,
    n_sched: int | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (prefill_out [Tq, Hq, D], decode_out [B, Hq, D])."""
    Tq, Hq, D = q_prefill.shape
    B = q_decode.shape[0]
    L, _, Hkv, R, _ = kv_cache.shape
    G = Hq // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    n_sched = n_sched or sched.size // 16
    sched_flat = sched.reshape(-1)
    qp_hm = q_prefill.reshape(Tq, Hkv, G, D).transpose(1, 2, 0, 3)

    def qp_index(t, sched_ref, *_):
        # sched is flattened [padded*16] in SMEM (see _pod_kernel)
        return (0, 0, sched_ref[t * 16 + 4], 0)

    # arena rows are resolved OUTSIDE the kernel into flat per-tile row
    # tables (the flash_decode host-row-table pattern): the index maps
    # are then single scalar reads.  The in-map 8-segment where-chain
    # lookup was implicated in a depth-dependent Mosaic runtime fault
    # (aborts/hangs once extent-table values crossed ~2048 -- bisected
    # via /tmp clean-room probes, docs/PERF.md), and scalar walks in
    # index maps were already the measured fixed-cost hot spot.
    n_pre_tiles = max(cdiv(R, kv_tile), 1)
    pre_rows = tile_rows_from_segments_jnp(
        pre_seg_row, pre_seg_cum, kv_tile, n_pre_tiles).reshape(-1)
    dec_rows = tile_rows_from_segments_jnp(
        dec_seg_row, dec_seg_cum, kv_tile, n_pre_tiles)

    # prefill K/V blocks are driven ONLY by the prefill stream state
    # (sched col 6, r*PRE_PACK+kt): while decode runs, the index is
    # unchanged and the Pallas pipeline elides the DMA.  The DECODE
    # stream has no BlockSpec at all -- its K/V moves via manual
    # double-buffered DMAs inside the kernel (_pod_kernel.dec_copies).
    def kv_pre_index(t, sched_ref, pre_rows_ref, dec_rows_ref,
                     qinfo_ref, linfo_ref, dsl, kv01):
        layer = linfo_ref[0]
        v = sched_ref[t * 16 + 6]
        row = pre_rows_ref[idiv(v, PRE_PACK) * n_pre_tiles
                           + v % PRE_PACK]
        return (layer, kv01, 0, idiv(row, kv_tile), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_sched,),
        in_specs=[
            pl.BlockSpec((Hkv, G, q_tile, D), qp_index),
            # the decode batch is small: keep it whole in VMEM and index
            # per slot in the kernel (a blocked spec would revisit blocks
            # in the weave's non-monotonic slot order)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, Hkv, kv_tile, D),
                         functools.partial(kv_pre_index, kv01=0)),
            pl.BlockSpec((None, None, Hkv, kv_tile, D),
                         functools.partial(kv_pre_index, kv01=1)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((Hkv, G, q_tile, D),
                         lambda t, sched_ref, *_:
                             (0, 0, sched_ref[t * 16 + 4], 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G * q_tile), jnp.float32),      # pm
            pltpu.VMEM((Hkv, G * q_tile), jnp.float32),      # pl
            pltpu.VMEM((Hkv, G * q_tile, D), jnp.float32),   # pacc
            pltpu.VMEM((B, Hkv, G), jnp.float32),            # dm
            pltpu.VMEM((B, Hkv, G), jnp.float32),            # dl
            pltpu.VMEM((B, Hkv, G, D), jnp.float32),         # dacc
            pltpu.VMEM((2, Hkv, kv_tile, D), kv_cache.dtype),  # kbuf
            pltpu.VMEM((2, Hkv, kv_tile, D), kv_cache.dtype),  # vbuf
            pltpu.SemaphoreType.DMA((2,)),                   # ksem
            pltpu.SemaphoreType.DMA((2,)),                   # vsem
        ],
    )
    kernel = functools.partial(
        _pod_kernel, q_tile=q_tile, kv_tile=kv_tile,
        num_segments=num_segments, sm_scale=sm_scale)
    op, od = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((Hkv, G, Tq, D), q_prefill.dtype),
            jax.ShapeDtypeStruct((B, Hq, D), q_decode.dtype),
        ),
        compiler_params=tpu_params(),
        interpret=interpret_mode(),
    )(sched_flat, pre_rows, dec_rows, qinfo.reshape(-1), linfo,
      dec_seqlens, qp_hm, q_decode, kv_cache, kv_cache, kv_cache)
    return op.transpose(2, 0, 1, 3).reshape(Tq, Hq, D), od
