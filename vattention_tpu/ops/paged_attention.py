"""Paged (block-table) flash attention -- the A/B baseline backend.

ref: the reference's FA_PAGED / FI_PAGED wrappers
(sarathi-lean flash_attention_wrapper.py:16-314,
flashinfer_attention_wrapper.py:14-191) built on block tables of small
blocks (16-256 tokens).  Here the same Pallas kernel bodies as the vattn
path (ops/flash_prefill.py, ops/flash_decode.py) run with an O(1)
block-table lookup in the BlockSpec index_map instead of the extent
scan: row = table[seq, pos // block_size] * block_size + pos %
block_size.  KV tiles equal the block size, so small-block configs pay
the same small-DMA cost the reference's paged baselines pay -- that is
the point of the A/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vattention_tpu.ops.flash_prefill import _prefill_kernel
from vattention_tpu.ops.utils import (cdiv, icdiv, idiv,
                                      interpret_mode, tpu_params)


@functools.partial(
    jax.jit,
    static_argnames=("q_tile", "block_size", "max_kv_tiles", "sm_scale"))
def paged_flash_prefill(
    q: jax.Array,            # [Tq, Hq, D], Tq % q_tile == 0
    kv_cache: jax.Array,     # [L, 2, Hkv, R, D] (R = num_blocks*block_size)
    block_table: jax.Array,  # [NB] int32 block ids of this sequence
    qinfo: jax.Array,        # [3] int32 (q_start, kv_len, layer)
    *,
    q_tile: int = 128,
    block_size: int = 256,
    sm_scale: float | None = None,
    max_kv_tiles: int | None = None,
) -> jax.Array:
    Tq, Hq, D = q.shape
    L, _, Hkv, R, _ = kv_cache.shape
    kv_tile = block_size
    assert Tq % q_tile == 0
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if max_kv_tiles is None:
        max_kv_tiles = block_table.shape[0]
    n_q_tiles = Tq // q_tile
    G = Hq // Hkv
    q_blk = q.reshape(Tq // q_tile, q_tile, Hkv, G, D)

    def kv_index_map(h, qt, kt, table_ref, qinfo_ref, kv01):
        layer = qinfo_ref[2]
        kv_len = qinfo_ref[1]
        n_kv_tiles = jnp.maximum(1, icdiv(kv_len, kv_tile))
        q_last_pos = qinfo_ref[0] + (qt + 1) * q_tile - 1
        diag_tile = jnp.minimum(idiv(q_last_pos, kv_tile),
                                n_kv_tiles - 1)
        t_eff = jnp.minimum(kt, diag_tile)
        return (layer, kv01, h, table_ref[t_eff], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Hkv, n_q_tiles, max_kv_tiles),
        in_specs=[
            pl.BlockSpec((None, q_tile, None, G, D),
                         lambda h, qt, kt, *_: (qt, 0, h, 0, 0)),
            pl.BlockSpec((None, None, None, kv_tile, D),
                         functools.partial(kv_index_map, kv01=0)),
            pl.BlockSpec((None, None, None, kv_tile, D),
                         functools.partial(kv_index_map, kv01=1)),
        ],
        out_specs=pl.BlockSpec((None, q_tile, None, G, D),
                               lambda h, qt, kt, *_: (qt, 0, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, q_tile * G), jnp.float32),
            pltpu.VMEM((1, q_tile * G), jnp.float32),
            pltpu.VMEM((q_tile * G, D), jnp.float32),
        ],
    )

    def kernel(table_ref, qinfo_ref, q_ref, k_ref, v_ref, out_ref,
               m_ref, l_ref, acc_ref):
        # reuse the flash body; it only consumes (seg-agnostic) qinfo
        _prefill_kernel(table_ref, table_ref, qinfo_ref, q_ref, k_ref,
                        v_ref, out_ref, m_ref, l_ref, acc_ref,
                        q_tile=q_tile, kv_tile=kv_tile, num_segments=0,
                        sm_scale=sm_scale)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q_blk.shape, q.dtype),
        compiler_params=tpu_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(block_table, qinfo, q_blk, kv_cache, kv_cache)
    return out.reshape(Tq, Hq, D)


@functools.partial(
    jax.jit,
    static_argnames=("q_tile", "block_size", "max_kv_tiles", "sm_scale",
                     "kv_fetch"))
def paged_flash_prefill_multi(
    q: jax.Array,             # [Tq, Hq, D], Tq % q_tile == 0
    kv_cache: jax.Array,      # [L, 2, Hkv, R, D]
    block_tables: jax.Array,  # [K, NB] int32 per-run block tables
    qinfo: jax.Array,         # [K, 2] int32 per-run (q_start, kv_len)
    qt_run: jax.Array,        # [Tq//q_tile, 2] int32 (run, local q-tile)
    linfo: jax.Array,         # [1] int32 (layer,)
    *,
    q_tile: int = 128,
    block_size: int = 256,
    sm_scale: float | None = None,
    max_kv_tiles: int | None = None,  # in kv_tile units
    kv_fetch: int = 1,
) -> jax.Array:
    """K prompts' chunks in one launch (paged twin of
    flash_prefill_multi; see that docstring for the run-table design).

    ``kv_fetch``: number of blocks fetched per compute tile (kv_tile =
    block_size * kv_fetch), each its own block-table-resolved DMA --
    small-block configs (the reference's fi_paged_16 analog) keep MXU
    tiles wide while honestly paying the per-block DMA granularity."""
    Tq, Hq, D = q.shape
    L, _, Hkv, R, _ = kv_cache.shape
    kv_tile = block_size * kv_fetch
    assert Tq % q_tile == 0
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    NB = block_tables.shape[1]
    if max_kv_tiles is None:
        max_kv_tiles = cdiv(NB, kv_fetch)

    n_q_tiles = Tq // q_tile
    G = Hq // Hkv
    q_blk = q.reshape(Tq // q_tile, q_tile, Hkv, G, D)

    def kv_index_map(h, qt, kt, qt_run_ref, qinfo_ref, table_ref,
                     linfo_ref, kv01, part):
        r = qt_run_ref[qt, 0]
        lqt = qt_run_ref[qt, 1]
        layer = linfo_ref[0]
        kv_len = qinfo_ref[r, 1]
        n_kv_tiles = jnp.maximum(1, icdiv(kv_len, kv_tile))
        q_last_pos = qinfo_ref[r, 0] + (lqt + 1) * q_tile - 1
        diag_tile = jnp.minimum(idiv(q_last_pos, kv_tile),
                                n_kv_tiles - 1)
        t_eff = jnp.minimum(kt, diag_tile)
        # clamp the part's block index to the run's last valid block so
        # a tile crossing the table tail cannot DMA a garbage entry
        # (rows past kv_len are masked in the kernel)
        n_blocks = jnp.maximum(icdiv(kv_len, block_size), 1)
        b_eff = jnp.minimum(t_eff * kv_fetch + part, n_blocks - 1)
        return (layer, kv01, h, table_ref[r, b_eff], 0)

    kv_specs = [
        pl.BlockSpec((None, None, None, block_size, D),
                     functools.partial(kv_index_map, kv01=kv01, part=p))
        for kv01 in (0, 1) for p in range(kv_fetch)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Hkv, n_q_tiles, max_kv_tiles),
        in_specs=[
            pl.BlockSpec((None, q_tile, None, G, D),
                         lambda h, qt, kt, *_: (qt, 0, h, 0, 0)),
            *kv_specs,
        ],
        out_specs=pl.BlockSpec((None, q_tile, None, G, D),
                               lambda h, qt, kt, *_: (qt, 0, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, q_tile * G), jnp.float32),
            pltpu.VMEM((1, q_tile * G), jnp.float32),
            pltpu.VMEM((q_tile * G, D), jnp.float32),
        ],
    )

    def kernel(qt_run_ref, qinfo_ref, table_ref, linfo_ref, q_ref,
               *rest):
        kv_refs, (out_ref, m_ref, l_ref, acc_ref) = \
            rest[:2 * kv_fetch], rest[2 * kv_fetch:]
        _prefill_kernel(table_ref, table_ref, qinfo_ref, q_ref,
                        tuple(kv_refs[:kv_fetch]),
                        tuple(kv_refs[kv_fetch:]),
                        out_ref, m_ref, l_ref, acc_ref,
                        q_tile=q_tile, kv_tile=kv_tile, num_segments=0,
                        sm_scale=sm_scale, qt_run_ref=qt_run_ref)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q_blk.shape, q.dtype),
        compiler_params=tpu_params(("parallel", "parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(qt_run, qinfo, block_tables, linfo, q_blk,
      *([kv_cache] * (2 * kv_fetch)))
    return out.reshape(Tq, Hq, D)


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "max_kv_tiles", "sm_scale"))
def paged_flash_decode(
    q: jax.Array,            # [B, Hq, D]
    kv_cache: jax.Array,     # [L, 2, Hkv, R, D]
    block_table: jax.Array,  # [B, NB] int32
    seqlens: jax.Array,      # [B] int32
    dinfo: jax.Array,        # [1] int32 (layer,)
    *,
    block_size: int = 256,
    sm_scale: float | None = None,
    max_kv_tiles: int | None = None,  # block-granular (table width) bound
) -> jax.Array:
    """A block table IS a sub-tile row table (row = block_id *
    block_size), so paged decode delegates to the shared flash_decode
    kernel: same seq-tiled batching and 256-token compute tiles; the
    paged cost that remains -- and that the A/B measures -- is the
    per-block DMA granularity and the table gather itself."""
    from vattention_tpu.ops.flash_decode import flash_decode

    B, Hq, D = q.shape
    L, _, Hkv, R, _ = kv_cache.shape
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    NB = block_table.shape[1]
    if max_kv_tiles is None:
        max_kv_tiles = NB
    kv_fetch = max(1, min(8, 256 // block_size))
    kv_tile = block_size * kv_fetch
    n_tiles = cdiv(max_kv_tiles, kv_fetch)
    tile_rows = block_table.astype(jnp.int32) * block_size
    need = n_tiles * kv_fetch
    if NB < need:
        tile_rows = jnp.pad(tile_rows, ((0, 0), (0, need - NB)))
    # with kv_fetch>1 the sub-tile parts of a sequence's last wide tile
    # would read table entries past its allocated blocks; clamp each
    # part's index to the last valid block (its rows are masked in the
    # kernel) so garbage/stale entries can never drive an out-of-range
    # DMA -- no zero-fill invariant required of the caller
    nb_valid = jnp.clip(-(-seqlens // block_size), 1, None)  # [B]
    part_idx = jnp.minimum(jnp.arange(need, dtype=jnp.int32)[None, :],
                           nb_valid[:, None] - 1)
    tile_rows = jnp.take_along_axis(tile_rows, part_idx, axis=1)
    # seq streams per grid step: divisor of B nearest 8 under the
    # scoped-VMEM budget (see VattnAttentionBackend.decode_seq_tile)
    per_seq = (2 * 2 * kv_tile * Hkv * D
               * jnp.dtype(kv_cache.dtype).itemsize)
    budget = 48 * 2**20
    seq_tile = 1
    for st in sorted((d for d in range(1, B + 1) if B % d == 0),
                     key=lambda d: (abs(d - 8), -d)):
        if st * per_seq <= budget:
            seq_tile = st
            break
    return flash_decode(
        q, kv_cache, tile_rows, seqlens, dinfo,
        kv_tile=kv_tile, sm_scale=sm_scale, max_kv_tiles=n_tiles,
        kv_fetch=kv_fetch, seq_tile=seq_tile)
