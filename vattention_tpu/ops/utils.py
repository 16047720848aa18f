"""Shared kernel utilities."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)

# Mosaic's default scoped-VMEM limit is 16MB; v5e has 128MB of VMEM.  The
# wide-tile decode path (seq_tile x kv_fetch block buffers, double-buffered
# by the pipeline) legitimately wants more than 16MB, so raise the limit
# and leave headroom for the compiler's own scratch.
VMEM_LIMIT_BYTES = 100 * 2**20


def tpu_params(dimension_semantics=None, **kw) -> pltpu.CompilerParams:
    """CompilerParams with the raised scoped-VMEM limit applied."""
    return pltpu.CompilerParams(
        dimension_semantics=dimension_semantics,
        vmem_limit_bytes=VMEM_LIMIT_BYTES, **kw)


@functools.cache
def interpret_mode() -> bool:
    """Pallas interpret mode everywhere except real TPU (CPU test tier)."""
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def idiv(a, b: int):
    """Traced-scalar // static divisor for BlockSpec index_maps.

    ``a // b`` via jnp lowers to a jitted floor_divide with sign
    correction -- a closed_call the index-map evaluator rejects for
    non-power-of-2 divisors (seen with 170-token blocks).  lax.div is a
    single trunc-division primitive, equal to floor for the non-negative
    values index maps work with.
    """
    return jax.lax.div(a, jnp.int32(b))


def icdiv(a, b: int):
    """Ceiling-division twin of idiv for index maps."""
    return jax.lax.div(a + jnp.int32(b - 1), jnp.int32(b))


def kv_tile_bucket_switch(n_needed, max_tiles: int, fn,
                          min_tiles: int = 4):
    """Run ``fn(b)`` for the smallest pow2 bucket ``b >= n_needed``.

    The attention kernels' kv-tile grids are static, so without a bound
    they cover max_model_len every step and the SKIPPED tail steps'
    fixed cost (~2-3us each: scalar index maps + DMA-elision checks)
    dominates long-context prefill -- measured 128K grid cells spent
    ~90% of prefill step time walking empty grid (docs/PERF.md).  Host
    -side pow2 hints (dynamic_kv_len_buckets) fix it at the price of a
    full-step recompile per bucket crossing INSIDE the serving run;
    this helper instead compiles every bucket variant into ONE program
    as `lax.switch` branches and picks the bucket from the live depth
    (a traced scalar) at run time -- no recompiles, no tail.
    """
    buckets = []
    b = min_tiles
    while b < max_tiles:
        buckets.append(b)
        b *= 2
    buckets.append(max_tiles)
    if len(buckets) == 1:
        return fn(buckets[0])
    idx = jnp.searchsorted(jnp.asarray(buckets, jnp.int32),
                           jnp.asarray(n_needed, jnp.int32))
    idx = jnp.clip(idx, 0, len(buckets) - 1)
    return jax.lax.switch(
        idx, [functools.partial(fn, bb) for bb in buckets])


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def select_kv_tile(block_tokens: int, preferred: int = 512) -> int:
    """KV tile size: must divide the allocator's block_tokens so tiles
    never straddle extent boundaries (extents are block-aligned)."""
    t = min(block_tokens, preferred)
    while block_tokens % t != 0:
        t -= 1
    return max(t, 1)


def tile_rows_from_segments(seg_row: np.ndarray, seg_cum: np.ndarray,
                            sub: int, n_sub: int) -> np.ndarray:
    """Host-side arena-row table for sub-tile starts (decode fast path).

    ``seg_row [B, S]``: arena row where extent j starts; ``seg_cum
    [B, S+1]``: cumulative tokens before extent j.  Returns ``[B, n_sub]``
    int32: the arena row of token position ``s*sub`` for each sub-tile s
    (0 for positions beyond the mapped extents -- those tiles are never
    read; the kernel clamps its tile index).  Replaces the in-kernel
    ``seg_row_lookup`` scalar unrolling on the decode path: resolving
    B x n_sub rows is a handful of vectorized numpy ops per step instead
    of 8-segment select chains inside every BlockSpec index_map call.
    """
    B = seg_row.shape[0]
    pos = (np.arange(n_sub, dtype=np.int64) * sub)[None, :]      # [1, n]
    cum = seg_cum.astype(np.int64)
    # extent index for each position: last j with cum[j] <= pos
    j = np.maximum((pos[..., None] >= cum[:, None, :-1]).sum(-1) - 1, 0)
    rows = (np.take_along_axis(seg_row.astype(np.int64), j, 1)
            + pos - np.take_along_axis(cum[:, :-1], j, 1))
    rows = np.where(pos < cum[:, -1:], rows, 0)
    return rows.astype(np.int32)


def tile_rows_from_segments_jnp(seg_row, seg_cum, sub: int,
                                n_sub: int):
    """jnp twin of ``tile_rows_from_segments`` for callers that build
    StepInputs without the host fast path (traced into the step; the
    [B, n_sub] integer ops are negligible)."""
    pos = (jnp.arange(n_sub, dtype=jnp.int32) * sub)[None, :]
    cum = seg_cum.astype(jnp.int32)
    j = jnp.maximum(
        jnp.sum(pos[..., None] >= cum[:, None, :-1], axis=-1) - 1, 0)
    rows = (jnp.take_along_axis(seg_row.astype(jnp.int32), j, 1)
            + pos - jnp.take_along_axis(cum[:, :-1], j, 1))
    return jnp.where(pos < cum[:, -1:], rows, 0).astype(jnp.int32)


def upcast_kv(x, dtype):
    """``x.astype(dtype)`` with a fast path for fp8 arenas.

    Mosaic lowers ``convert_element_type f8_e4m3 -> bf16`` ~8x slower
    than the surrounding DMA stream (measured: flash_decode at 64K/fp8
    ran at 7% of HBM peak vs 64% with an int8 source -- the byte loads
    are fine, the convert op is the cliff).  e4m3 -> bf16 is exact, so
    widen by hand with integer ops the VPU runs at full rate:

        normal  (e>0): bf16 = sign | (e + 120) << 7 | m << 4
        denorm  (e=0): bf16 = +-(m * 2^-9)

    Assumes finite inputs: the append path only ever stores saturated
    finite values (e4m3fn has no inf; NaN would need a NaN activation).
    """
    if x.dtype != jnp.float8_e4m3fn:
        return x if x.dtype == dtype else x.astype(dtype)
    # int32 lanes: Mosaic legalizes 32-bit vector shifts (i16 shli does
    # not lower).  The e4m3 exponent+mantissa land in the f32
    # exponent+mantissa fields at bit 20; that f32 reads 1.m * 2^(e-127),
    # so one exact power-of-two multiply by 2^120 yields 1.m * 2^(e-7).
    # e=0 would ride the same path as an f32 denormal, but both the TPU
    # VPU and XLA:CPU flush f32 denormals -- those 14 bit patterns
    # (|x| = m * 2^-9) take an integer-built select path instead.
    bits = jax.lax.bitcast_convert_type(x, jnp.int8).astype(jnp.int32)
    t = ((bits & 0x7F) << 20) | ((bits & 0x80) << 24)
    normal = (jax.lax.bitcast_convert_type(t, jnp.float32)
              * jnp.float32(2.0 ** 120))
    # signed mantissa: m * (+-1) via 1 - ((bits >> 6) & 2)
    sm = (bits & 0x7) * (1 - ((bits >> 6) & 2))
    out = jnp.where((bits & 0x78) == 0,
                    sm.astype(jnp.float32) * jnp.float32(2.0 ** -9),
                    normal)
    return out.astype(dtype)


def upcast_kv_packed(x, dtype, exact: bool | None = None):
    """e4m3 -> bf16 widening at 2 values per 32-bit lane; output rows
    permuted to even-positions-then-odd-positions along the second-minor
    axis (see ``packed_kv_pos``).

    ``upcast_kv`` widens one fp8 value per int32 lane (~14 VPU ops per
    value at 1/4 register occupancy -- i16 shifts do not legalize in
    Mosaic, so the scalar path is stuck on 32-bit lanes).  This variant
    bitcasts 4 consecutive rows into each 32-bit lane (``pltpu.bitcast``
    is row-major on both TPU and interpret mode) and builds two bf16
    patterns per 32-bit op:

      p = bytes [b0 b1 b2 b3] of rows r..r+3       (one uint32 lane)
      t_even = ((p & 0x007F007F) << 4) | ((p & 0x00800080) << 8)
      t_odd  = ((p & 0x7F007F00) >> 4) |  (p & 0x80008000)

    which lands each byte's payload in its bf16 half's exponent+mantissa
    field (exponent biased 127 vs e4m3's 7) and the sign at bit 15/31.
    Normals rebias by an INTEGER add of 120<<7 per half (e+120 <= 135
    cannot carry across the half).  Denormals (e=0: |v| = m * 2^-9)
    take a magic-number path -- bf16(0x4300|m) - 128 = m exactly, times
    a sign-patterned +-2^-9 -- and the two are merged with a uint32
    mask spread from the is-normal bit, so the result is deterministic
    and flush-independent (Mosaic rejects bf16 vector compares, and the
    float-select alternative depends on denormal flush behavior).
    Exhaustively bit-exact vs astype on all 254 finite patterns on both
    TPU and interpret mode (tests/test_kernels.py).

    Output row order: t_even's bf16 pair is rows (r, r+2), t_odd's is
    (r+1, r+3); concatenating all-even then all-odd along the row axis
    gives logical positions pos(i) = 2i for the first half and
    2(i - T/2) + 1 for the second.  Attention is permutation-invariant
    over KV rows, so callers feed K and V through the same packing and
    mask with ``packed_kv_pos`` instead of a plain iota.

    ``exact=False`` (the default unless VATTN_FP8_EXACT=1) drops the
    denormal machinery: rebias is ONE bf16 multiply by 2^120 per pair,
    which maps +-0 to +-0 (a zero half stays zero bits) and every
    normal pattern exactly; denormal PATTERNS decode to m*2^-9-or-zero
    depending on platform flush behavior.  The arena never contains
    them: the append path flushes sub-normal-magnitude inputs to zero
    at write time (VattnAttentionBackend._flush_fp8_subnormals), so the
    fast path is value-exact on everything the kernels read while
    costing ~11 VPU lane-ops per 4 values vs the exact path's ~26 --
    at 64K decode depth the convert stream is VPU-throughput-bound and
    this is the difference between ~32% and ~55%+ of the fp8 byte
    roofline (docs/PERF.md).
    """
    import os
    if exact is None:
        exact = os.environ.get("VATTN_FP8_EXACT", "0") == "1"
    U = jnp.uint32
    assert x.dtype == jnp.float8_e4m3fn, x.dtype
    T = x.shape[-2]
    assert T % 4 == 0, x.shape
    p = pltpu.bitcast(jax.lax.bitcast_convert_type(x, jnp.int8),
                      jnp.uint32)                      # [..., T//4, D]
    if not exact:
        scale = jnp.bfloat16(2.0 ** 120)
        t_e = (((p & U(0x007F007F)) << 4)
               | ((p & U(0x00800080)) << 8))
        t_o = ((p & U(0x7F007F00)) >> 4) | (p & U(0x80008000))
        out = jnp.concatenate(
            [pltpu.bitcast(t_e, jnp.bfloat16) * scale,
             pltpu.bitcast(t_o, jnp.bfloat16) * scale], axis=-2)
        return out if dtype == jnp.bfloat16 else out.astype(dtype)
    sign_e = (p & U(0x00800080)) << 8
    t_e = ((p & U(0x007F007F)) << 4) | sign_e
    n_e = t_e + U(0x3C003C00)
    x_e = (p & U(0x00780078)) + U(0x00780078)
    nz_e = ((x_e >> 7) & U(0x00010001)) * U(0xFFFF)
    dm_e = pltpu.bitcast((p & U(0x00070007)) | U(0x43004300),
                         jnp.bfloat16) - 128
    ds_e = pltpu.bitcast(sign_e | U(0x3B003B00), jnp.bfloat16)
    db_e = pltpu.bitcast(dm_e * ds_e, jnp.uint32)
    o_e = (n_e & nz_e) | (db_e & (nz_e ^ U(0xFFFFFFFF)))

    sign_o = p & U(0x80008000)
    t_o = ((p & U(0x7F007F00)) >> 4) | sign_o
    n_o = t_o + U(0x3C003C00)
    x_o = ((p >> 8) & U(0x00780078)) + U(0x00780078)
    nz_o = ((x_o >> 7) & U(0x00010001)) * U(0xFFFF)
    dm_o = pltpu.bitcast(((p >> 8) & U(0x00070007)) | U(0x43004300),
                         jnp.bfloat16) - 128
    ds_o = pltpu.bitcast(sign_o | U(0x3B003B00), jnp.bfloat16)
    db_o = pltpu.bitcast(dm_o * ds_o, jnp.uint32)
    o_o = (n_o & nz_o) | (db_o & (nz_o ^ U(0xFFFFFFFF)))

    out = jnp.concatenate([pltpu.bitcast(o_e, jnp.bfloat16),
                           pltpu.bitcast(o_o, jnp.bfloat16)], axis=-2)
    return out if dtype == jnp.bfloat16 else out.astype(dtype)


def fp8_packed_enabled(dtype) -> bool:
    """Packed fp8 widening is default-on for e4m3 arenas;
    VATTN_FP8_PACKED=0 opts out (A/B measurement knob)."""
    import os
    return (jnp.dtype(dtype) == jnp.float8_e4m3fn
            and os.environ.get("VATTN_FP8_PACKED", "1") != "0")


def packed_kv_pos(i, T: int):
    """Logical KV position of stored row ``i`` after ``upcast_kv_packed``:
    the first half holds even positions (pos = 2i), the second half odd
    (pos = 2(i - T/2) + 1)."""
    half = T // 2
    return jnp.where(i < half, 2 * i, 2 * (i - half) + 1)


def seg_row_lookup(pos, seg_row_ref, seg_cum_ref, num_segments: int,
                   prefix=()):
    """Arena row for token position ``pos`` given extent tables.

    ``seg_row_ref[*prefix, j]``: arena row where extent j starts;
    ``seg_cum_ref[*prefix, j]``: cumulative token count before extent j
    (index S = total mapped).  Statically unrolled over the (small) extent
    budget -- pure scalar ops, usable inside BlockSpec index_maps (scalar
    prefetch).  ``prefix`` selects the request row in batched tables.
    """
    row = jnp.zeros((), jnp.int32)
    for j in range(num_segments):
        lo = seg_cum_ref[(*prefix, j)]
        hi = seg_cum_ref[(*prefix, j + 1)]
        within = jnp.logical_and(pos >= lo, pos < hi)
        row = jnp.where(within, seg_row_ref[(*prefix, j)] + pos - lo, row)
    return row
