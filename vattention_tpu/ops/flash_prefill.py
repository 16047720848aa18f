"""Chunked-prefill flash attention over the contiguous KV arena.

TPU-native equivalent of ``flash_attn_with_kvcache`` for the prefill phase
(ref: sarathi-lean vattention_flashattention_wrapper.py:150-166): one
sequence's prompt chunk attends over its full KV history, which lives in
the request's (nearly) contiguous arena extents.  The chunk's own K/V has
already been appended to the arena (ops/cache_append.py), so the kernel
reads history *and* current chunk straight from the cache -- no separate
K/V operand and no block tables: the BlockSpec index_map resolves the
request's extent table with scalar arithmetic (scalar prefetch) and the
automatic Pallas pipeline double-buffers the HBM->VMEM tile DMAs.

Performance structure (v5e measurements drove these choices):
  - the kv head is a GRID dimension, not a matmul batch dim: each grid
    step runs plain 2-D [G*q_tile, D] x [D, kv_tile] MXU matmuls, which
    Mosaic schedules far better than Hkv-batched dots, and the 4x smaller
    per-step footprint admits kv_tile=512;
  - q/out blocks slice the native [Tq, Hq, D] layout (heads of one kv
    group are adjacent), so no host-side transposes;
  - interior tiles skip causal/length mask construction entirely -- the
    masked body runs only where the tile crosses the diagonal or the
    kv-length boundary (the splash-attention dual-body pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vattention_tpu.ops.utils import (MASK_VALUE, cdiv, icdiv, idiv,
                                      interpret_mode, seg_row_lookup,
                                      packed_kv_pos, tpu_params,
                                      upcast_kv, upcast_kv_packed)


def _prefill_kernel(
    # scalar prefetch
    seg_row_ref, seg_cum_ref, qinfo_ref,
    # blocks
    q_ref, k_refs, v_refs, out_ref,
    # scratch
    m_ref, l_ref, acc_ref,
    *, q_tile: int, kv_tile: int, num_segments: int, sm_scale: float,
    window: int | None = None, qt_run_ref=None,
    fp8_packed: bool = False,
):
    if not isinstance(k_refs, (tuple, list)):
        k_refs, v_refs = (k_refs,), (v_refs,)
    qt = pl.program_id(1)
    kt = pl.program_id(2)
    if qt_run_ref is None:
        # single run: qinfo is [>=2] (q_start, kv_len, ...)
        q_start = qinfo_ref[0]      # absolute position of q token 0
        kv_len = qinfo_ref[1]       # total kv rows to attend (history+chunk)
        lqt = qt
    else:
        # multi-run: each q tile belongs to one prefill run (sequence);
        # qt_run[qt] = (run, local q-tile index), qinfo is [K, 2]
        r = qt_run_ref[qt, 0]
        lqt = qt_run_ref[qt, 1]
        q_start = qinfo_ref[r, 0]
        kv_len = qinfo_ref[r, 1]

    n_kv_tiles = jnp.maximum(1, icdiv(kv_len, kv_tile))
    # last tile this q tile may see under causality
    q_lo = q_start + lqt * q_tile
    q_last_pos = q_lo + q_tile - 1
    diag_tile = jnp.minimum(idiv(q_last_pos, kv_tile),
                            n_kv_tiles - 1)

    @pl.when(kt == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    tile_start = kt * kv_tile
    # mask needed only where the tile crosses the causal diagonal, the
    # kv-length tail, or (sliding window) the window's leading edge
    crosses_diag = tile_start + kv_tile - 1 > q_lo
    crosses_len = tile_start + kv_tile > kv_len
    if window is not None:
        # earliest window start among this q tile's rows
        crosses_window = tile_start < q_last_pos - window + 1
    else:
        crosses_window = False

    def body(masked: bool):
        q_tile_, G, D = q_ref.shape
        q = q_ref[...].reshape(q_tile * G, D)  # row = t*G + g
        m = m_ref[0]   # [q_tile*G]
        l = l_ref[0]
        acc = acc_ref[...]
        # the compute tile may arrive as several block-aligned sub-tile
        # DMAs (extents are only block_tokens-aligned); the parts are
        # CONSECUTIVE kv ranges, so a VMEM concatenate rebuilds the
        # contiguous tile and the softmax update runs ONCE per tile --
        # small-page configs (64-token blocks) would otherwise pay 8x the
        # VPU bookkeeping per tile, which is what made the vattn A/B lose
        # to paged-256 at 32K
        k = (k_refs[0][...] if len(k_refs) == 1 else
             jnp.concatenate([r[...] for r in k_refs], axis=0))
        v = (v_refs[0][...] if len(v_refs) == 1 else
             jnp.concatenate([r[...] for r in v_refs], axis=0))
        # keep matmul inputs in the compute dtype: bf16 hits the MXU
        # at full rate (f32 accumulate); f32 test mode stays
        # bit-exact; fp8 arenas upcast via the manual widening
        # (Mosaic's native fp8 convert is ~8x off bandwidth --
        # ops/utils.upcast_kv; the packed variant's row permutation is
        # absorbed into kv_pos below)
        widen = upcast_kv_packed if fp8_packed else upcast_kv
        k = widen(k, q.dtype)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [q_tile*G, kv_tile]
        s = s * sm_scale

        if masked:
            row = jax.lax.broadcasted_iota(
                jnp.int32, (q_tile * G, kv_tile), 0)
            q_pos = q_lo + idiv(row, G)
            kv_pos = jax.lax.broadcasted_iota(
                jnp.int32, (q_tile * G, kv_tile), 1)
            if fp8_packed:
                kv_pos = packed_kv_pos(kv_pos, kv_tile)
            kv_pos = tile_start + kv_pos
            mask = jnp.logical_and(q_pos >= kv_pos, kv_pos < kv_len)
            if window is not None:
                mask = jnp.logical_and(mask, kv_pos > q_pos - window)
            s = jnp.where(mask, s, MASK_VALUE)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        v = widen(v, q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [q_tile*G, D]
        acc = acc * alpha[:, None] + pv
        m_ref[0] = m_new
        l_ref[0] = l
        acc_ref[...] = acc

    need_mask = jnp.logical_or(jnp.logical_or(crosses_diag, crosses_len),
                               crosses_window)
    # kv_len == 0 marks the empty run that fixed-width prefill padding
    # maps tail q tiles to (model_runner._prepare_inputs): fully dead
    live = jnp.logical_and(kt <= diag_tile, kv_len > 0)

    @pl.when(jnp.logical_and(live, need_mask))
    def _masked():
        body(masked=True)

    @pl.when(jnp.logical_and(live, jnp.logical_not(need_mask)))
    def _unmasked():
        body(masked=False)

    @pl.when(kt == pl.num_programs(2) - 1)
    def _finish():
        q_tile_, G, D = q_ref.shape
        l = l_ref[0]
        l = jnp.where(l == 0.0, 1.0, l)
        o = acc_ref[...] / l[:, None]  # [q_tile*G, D]
        out_ref[...] = o.reshape(q_tile_, G, D).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("q_tile", "kv_tile", "num_segments",
                     "sm_scale", "max_kv_tiles", "window", "kv_fetch",
                     "fp8_packed"))
def flash_prefill(
    q: jax.Array,            # [Tq, Hq, D], Tq % q_tile == 0
    kv_cache: jax.Array,     # [L, 2, Hkv, R, D]
    seg_row: jax.Array,      # [S] int32 arena row of each extent
    seg_cum: jax.Array,      # [S+1] int32 cumulative tokens before extent
    qinfo: jax.Array,        # [3] int32: (q_start, kv_len, layer)
    *,
    q_tile: int = 128,
    kv_tile: int = 512,
    num_segments: int = 8,
    sm_scale: float | None = None,
    max_kv_tiles: int | None = None,
    window: int | None = None,
    kv_fetch: int = 1,
    fp8_packed: bool = False,
) -> jax.Array:
    """``kv_fetch`` splits the compute tile into that many separately
    addressed sub-tile DMAs of kv_tile/kv_fetch rows each, so a 512-wide
    MXU tile works even when arena extents are only 256-token aligned
    (the 256KB-page configuration)."""
    Tq, Hq, D = q.shape
    L, _, Hkv, R, _ = kv_cache.shape
    assert Tq % q_tile == 0, (Tq, q_tile)
    assert kv_tile % kv_fetch == 0
    sub = kv_tile // kv_fetch
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if max_kv_tiles is None:
        max_kv_tiles = cdiv(R, kv_tile)
    n_q_tiles = Tq // q_tile
    G = Hq // Hkv
    # heads of one kv group are adjacent in [Tq, Hq, D]: block (q_tile, G,
    # D) at head offset h*G slices q/out without any transpose
    q_blk = q.reshape(Tq // q_tile, q_tile, Hkv, G, D)

    def kv_index_map(h, qt, kt, seg_row_ref, seg_cum_ref, qinfo_ref,
                     kv01, part):
        layer = qinfo_ref[2]
        kv_len = qinfo_ref[1]
        n_kv_tiles = jnp.maximum(1, icdiv(kv_len, kv_tile))
        q_last_pos = qinfo_ref[0] + (qt + 1) * q_tile - 1
        diag_tile = jnp.minimum(idiv(q_last_pos, kv_tile), n_kv_tiles - 1)
        t_eff = jnp.minimum(kt, diag_tile)  # clamp: repeats elide the DMA
        row = seg_row_lookup(t_eff * kv_tile + part * sub, seg_row_ref,
                             seg_cum_ref, num_segments)
        return (layer, kv01, h, idiv(row, sub), 0)

    kv_specs = [
        pl.BlockSpec((None, None, None, sub, D),
                     functools.partial(kv_index_map, kv01=kv01, part=p))
        for kv01 in (0, 1) for p in range(kv_fetch)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Hkv, n_q_tiles, max_kv_tiles),
        in_specs=[
            pl.BlockSpec((None, q_tile, None, G, D),
                         lambda h, qt, kt, *_: (qt, 0, h, 0, 0)),
            *kv_specs,
        ],
        out_specs=pl.BlockSpec((None, q_tile, None, G, D),
                               lambda h, qt, kt, *_: (qt, 0, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, q_tile * G), jnp.float32),     # m
            pltpu.VMEM((1, q_tile * G), jnp.float32),     # l
            pltpu.VMEM((q_tile * G, D), jnp.float32),     # acc
        ],
    )

    def kernel(seg_row_ref, seg_cum_ref, qinfo_ref, q_ref, *rest):
        kv_refs, (out_ref, m_ref, l_ref, acc_ref) = \
            rest[:2 * kv_fetch], rest[2 * kv_fetch:]
        _prefill_kernel(seg_row_ref, seg_cum_ref, qinfo_ref, q_ref,
                        tuple(kv_refs[:kv_fetch]), tuple(kv_refs[kv_fetch:]),
                        out_ref, m_ref, l_ref, acc_ref,
                        q_tile=q_tile, kv_tile=kv_tile,
                        num_segments=num_segments, sm_scale=sm_scale,
                        window=window, fp8_packed=fp8_packed)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q_blk.shape, q.dtype),
        compiler_params=tpu_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(seg_row, seg_cum, qinfo, q_blk,
      *([kv_cache] * (2 * kv_fetch)))
    return out.reshape(Tq, Hq, D)


@functools.partial(
    jax.jit,
    static_argnames=("q_tile", "kv_tile", "num_segments",
                     "sm_scale", "max_kv_tiles", "window", "kv_fetch",
                     "fp8_packed"))
def flash_prefill_multi(
    q: jax.Array,            # [Tq, Hq, D], Tq % q_tile == 0
    kv_cache: jax.Array,     # [L, 2, Hkv, R, D]
    seg_row: jax.Array,      # [K, S] int32 per-run extent start rows
    seg_cum: jax.Array,      # [K, S+1] int32 per-run cumulative tokens
    qinfo: jax.Array,        # [K, 2] int32 per-run (q_start, kv_len)
    qt_run: jax.Array,       # [Tq//q_tile, 2] int32 (run, local q-tile)
    linfo: jax.Array,        # [1] int32 (layer,)
    tile_rows: jax.Array | None = None,  # [K, >= max_kv_tiles*kv_fetch]
    *,
    q_tile: int = 128,
    kv_tile: int = 512,
    num_segments: int = 8,
    sm_scale: float | None = None,
    max_kv_tiles: int | None = None,
    window: int | None = None,
    kv_fetch: int = 1,
    fp8_packed: bool = False,
) -> jax.Array:
    """Multi-sequence chunked prefill in ONE kernel launch.

    Lifts the reference's one-prefill-per-iteration contract (its vLLM
    scheduler batches many whole prompts per step,
    sarathi-lean/sarathi/core/scheduler/vllm_scheduler.py:20+): the q
    region is a concatenation of K runs, each padded to ``q_tile``, and a
    host-built per-q-tile table maps grid position -> (run, local tile).
    Each run attends its OWN extent chain / causal frontier, so K prompts
    cost one launch (the per-seq Python loop of the reference's wrapper,
    vattention_flashattention_wrapper.py:125-181, becomes grid steps).
    """
    Tq, Hq, D = q.shape
    L, _, Hkv, R, _ = kv_cache.shape
    assert Tq % q_tile == 0, (Tq, q_tile)
    assert kv_tile % kv_fetch == 0
    sub = kv_tile // kv_fetch
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if max_kv_tiles is None:
        max_kv_tiles = cdiv(R, kv_tile)
    n_q_tiles = Tq // q_tile
    G = Hq // Hkv
    q_blk = q.reshape(Tq // q_tile, q_tile, Hkv, G, D)

    # extent resolution: a host/trace-precomputed per-(run, sub-tile)
    # row table costs ONE scalar read per index-map call; the unrolled
    # 8-segment where-chain alternative costs ~an order of magnitude
    # more scalar work per grid step, which at 128K-deep prefill grids
    # (16k+ steps/layer-call) measurably drags the whole kernel (the
    # same rule flash_decode established; docs/PERF.md)
    use_table = tile_rows is not None

    def kv_index_map(h, qt, kt, qt_run_ref, qinfo_ref, tbl_or_row_ref,
                     seg_cum_ref, linfo_ref, kv01, part):
        r = qt_run_ref[qt, 0]
        lqt = qt_run_ref[qt, 1]
        layer = linfo_ref[0]
        kv_len = qinfo_ref[r, 1]
        n_kv_tiles = jnp.maximum(1, icdiv(kv_len, kv_tile))
        q_last_pos = qinfo_ref[r, 0] + (lqt + 1) * q_tile - 1
        diag_tile = jnp.minimum(idiv(q_last_pos, kv_tile), n_kv_tiles - 1)
        t_eff = jnp.minimum(kt, diag_tile)  # clamp: repeats elide the DMA
        if use_table:
            row = tbl_or_row_ref[r, t_eff * kv_fetch + part]
        else:
            row = seg_row_lookup(t_eff * kv_tile + part * sub,
                                 tbl_or_row_ref, seg_cum_ref,
                                 num_segments, prefix=(r,))
        return (layer, kv01, h, idiv(row, sub), 0)

    kv_specs = [
        pl.BlockSpec((None, None, None, sub, D),
                     functools.partial(kv_index_map, kv01=kv01, part=p))
        for kv01 in (0, 1) for p in range(kv_fetch)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(Hkv, n_q_tiles, max_kv_tiles),
        in_specs=[
            pl.BlockSpec((None, q_tile, None, G, D),
                         lambda h, qt, kt, *_: (qt, 0, h, 0, 0)),
            *kv_specs,
        ],
        out_specs=pl.BlockSpec((None, q_tile, None, G, D),
                               lambda h, qt, kt, *_: (qt, 0, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, q_tile * G), jnp.float32),     # m
            pltpu.VMEM((1, q_tile * G), jnp.float32),     # l
            pltpu.VMEM((q_tile * G, D), jnp.float32),     # acc
        ],
    )

    def kernel(qt_run_ref, qinfo_ref, seg_row_ref, seg_cum_ref,
               linfo_ref, q_ref, *rest):
        kv_refs, (out_ref, m_ref, l_ref, acc_ref) = \
            rest[:2 * kv_fetch], rest[2 * kv_fetch:]
        _prefill_kernel(seg_row_ref, seg_cum_ref, qinfo_ref, q_ref,
                        tuple(kv_refs[:kv_fetch]), tuple(kv_refs[kv_fetch:]),
                        out_ref, m_ref, l_ref, acc_ref,
                        q_tile=q_tile, kv_tile=kv_tile,
                        num_segments=num_segments, sm_scale=sm_scale,
                        window=window, qt_run_ref=qt_run_ref,
                        fp8_packed=fp8_packed)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q_blk.shape, q.dtype),
        compiler_params=tpu_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(qt_run, qinfo, tile_rows if use_table else seg_row, seg_cum,
      linfo, q_blk, *([kv_cache] * (2 * kv_fetch)))
    return out.reshape(Tq, Hq, D)
