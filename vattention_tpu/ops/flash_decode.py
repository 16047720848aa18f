"""Batched decode flash attention over the contiguous KV arena.

TPU-native equivalent of ``flash_attn_with_kvcache(q, cache, cache_seqlens,
cache_batch_idx)`` for the decode phase (ref: sarathi-lean
vattention_flashattention_wrapper.py:191-205): every scheduled sequence
contributes one query token that attends over its KV history in the arena.
The reference's ``cache_batch_idx`` gather generalizes to a host-built
per-(sequence, tile) arena-row table consumed by the BlockSpec index_maps
via scalar prefetch; the Pallas pipeline double-buffers KV tile DMAs and
elides fetches for tiles beyond a sequence's length (clamped index trick).

Decode is HBM-bandwidth-bound, and on TPU the limiter is per-grid-step
fixed cost (DMA issue + semaphores + scalar index maps), not the streams
themselves.  Two measured design rules (v5e, ~90% of HBM peak):
  - ``seq_tile`` sequences share one grid step -- their KV tiles are
    independent DMA buffers issued together, and the softmax state is
    updated with single wide ops (member loops of tiny matmul/VPU ops
    are instruction-issue-bound);
  - extent resolution lives on the host (``tile_rows``): in-kernel
    segment-table walks in the index_maps were the dominant fixed cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vattention_tpu.ops.utils import (MASK_VALUE, cdiv, icdiv, idiv,
                                      interpret_mode, packed_kv_pos,
                                      tpu_params, upcast_kv,
                                      upcast_kv_packed)


def _decode_kernel(
    # scalar prefetch
    tile_rows_ref, seqlens_ref, dinfo_ref,
    # blocks
    q_ref, kv_refs, out_ref,
    # scratch
    m_ref, l_ref, acc_ref,
    *, kv_tile: int, kv_fetch: int, seq_tile: int,
    sm_scale: float, window: int | None = None,
    fp8_packed: bool = False,
):
    g = pl.program_id(0)
    kt = pl.program_id(1)
    bs = seq_tile
    # group runs to the longest member's tile count; shorter members'
    # contributions are masked to zero past their own length
    n_tiles = icdiv(seqlens_ref[g * bs], kv_tile)
    for j in range(1, bs):
        n_tiles = jnp.maximum(
            n_tiles, icdiv(seqlens_ref[g * bs + j], kv_tile))

    @pl.when(kt == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(kt < n_tiles)
    def _compute():
        bs_, Hq, D = q_ref.shape
        Hkv = kv_refs[0].shape[0]
        sub = kv_refs[0].shape[1]
        G = Hq // Hkv
        # all members batched into single wide ops: per-member iterations
        # issue tiny matmuls/VPU ops whose instruction overhead, not HBM
        # bandwidth, would bound the kernel
        q = q_ref[...].reshape(bs, Hkv, G, D)
        m = m_ref[...]       # [bs, Hkv, G]
        l = l_ref[...]
        acc = acc_ref[...]   # [bs, Hkv, G, D]
        # one wide op per tile: members stacked on a batch axis and the
        # kv_fetch sub-tile DMAs (consecutive kv ranges) concatenated
        # back into the contiguous tile
        def gather(base):
            per_member = []
            for j in range(bs):
                parts = [kv_refs[(2 * j + base) * kv_fetch + i][...]
                         for i in range(kv_fetch)]
                per_member.append(
                    parts[0] if kv_fetch == 1 else
                    jnp.concatenate(parts, axis=1))  # [Hkv, kv_tile, D]
            return jnp.stack(per_member)             # [bs, Hkv, kv_tile, D]

        k = gather(0)
        v = gather(1)
        # compute-dtype matmuls (bf16 MXU, f32 accumulate); fp8 arenas
        # upcast via the manual widening (Mosaic's native fp8 convert is
        # ~8x off bandwidth -- ops/utils.upcast_kv).  The packed variant
        # widens 2 values per 32-bit lane; its row permutation is
        # absorbed by remapping kv_pos (attention is row-permutation
        # invariant when K, V and the mask share the permutation).
        widen = upcast_kv_packed if fp8_packed else upcast_kv
        k = widen(k, q.dtype)
        # Mosaic's matmul takes ONE batch dim: fold (bs, Hkv)
        s = jax.lax.dot_general(
            q.reshape(bs * Hkv, G, D), k.reshape(bs * Hkv, kv_tile, D),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bs, Hkv, G, kv_tile)
        s = s * sm_scale
        kv_pos = jax.lax.broadcasted_iota(jnp.int32, (G, kv_tile), 1)
        if fp8_packed:
            kv_pos = packed_kv_pos(kv_pos, kv_tile)
        kv_pos = kt * kv_tile + kv_pos
        # per-member masks from SMEM scalars (scalar broadcasts are
        # free; broadcasting a 1-D [bs] vector into leading dims is a
        # shape cast Mosaic cannot lay out)
        member_valid = []
        for j in range(bs):
            kv_len = seqlens_ref[g * bs + j]
            vj = kv_pos < kv_len
            if window is not None:
                vj = jnp.logical_and(vj, kv_pos >= kv_len - window)
            member_valid.append(vj)
        valid = jnp.stack(member_valid)[:, None]  # [bs, 1, G, kv_tile]
        s = jnp.where(valid, s, MASK_VALUE)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # explicit zeroing handles fully-masked tiles (inactive slots,
        # short members of a group running to the longest member's
        # tile count): exp(MASK-MASK)=1 garbage must not accumulate
        p = jnp.where(valid, jnp.exp(s - m_new[..., None]), 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        v = widen(v, q_ref.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype).reshape(bs * Hkv, G, kv_tile),
            v.reshape(bs * Hkv, kv_tile, D),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(bs, Hkv, G, D)
        acc = acc * alpha[..., None] + pv
        m_ref[...] = m_new
        l_ref[...] = l
        acc_ref[...] = acc

        @pl.when(kt == n_tiles - 1)
        def _finish():
            l = l_ref[...]                       # [bs, Hkv, G]
            l = jnp.where(l == 0.0, 1.0, l)
            o = acc_ref[...] / l[..., None]      # [bs, Hkv, G, D]
            out_ref[...] = o.reshape(bs, Hq, D).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_tile", "sm_scale", "max_kv_tiles", "window",
                     "kv_fetch", "seq_tile", "fp8_packed"))
def flash_decode(
    q: jax.Array,            # [B, Hq, D]
    kv_cache: jax.Array,     # [L, 2, Hkv, R, D]
    tile_rows: jax.Array,    # [B, >=max_kv_tiles*kv_fetch] int32 arena row
                             # of each sub-tile start (see
                             # tile_rows_from_segments)
    seqlens: jax.Array,      # [B] int32 (0 = inactive slot)
    dinfo: jax.Array,        # [1] int32: (layer,)
    *,
    kv_tile: int = 512,
    sm_scale: float | None = None,
    max_kv_tiles: int | None = None,
    window: int | None = None,
    kv_fetch: int = 1,
    seq_tile: int = 1,
    fp8_packed: bool = False,
) -> jax.Array:
    """``kv_fetch`` splits the compute tile into block-aligned sub-tile
    DMAs (see flash_prefill) so wide tiles work on small-page arenas;
    ``seq_tile`` groups that many sequences into one grid step (B must be
    a multiple) to amortize per-step fixed costs.  Extent resolution
    happens host-side (``tile_rows``): the index_maps then cost two
    scalar reads per (seq, tile) instead of an unrolled segment-table
    walk -- the dominant fixed cost at serving batch sizes."""
    B, Hq, D = q.shape
    L, _, Hkv, R, _ = kv_cache.shape
    assert kv_tile % kv_fetch == 0
    if fp8_packed:
        assert kv_cache.dtype == jnp.float8_e4m3fn, kv_cache.dtype
        assert kv_tile % 4 == 0, kv_tile
    assert B % seq_tile == 0, (B, seq_tile)
    bs = seq_tile
    sub = kv_tile // kv_fetch
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if max_kv_tiles is None:
        max_kv_tiles = cdiv(R, kv_tile)
    assert tile_rows.shape[1] >= max_kv_tiles * kv_fetch, (
        tile_rows.shape, max_kv_tiles, kv_fetch)
    G = Hq // Hkv

    def kv_index_map(g, kt, tile_rows_ref, seqlens_ref, dinfo_ref,
                     j, kv01, part):
        b = g * bs + j
        layer = dinfo_ref[0]
        n_tiles = icdiv(seqlens_ref[b], kv_tile)
        t_eff = jnp.clip(kt, 0, jnp.maximum(n_tiles - 1, 0))
        row = tile_rows_ref[b, t_eff * kv_fetch + part]
        return (layer, kv01, 0, idiv(row, sub), 0)

    # buffer order per seq j: kv_fetch K parts, then kv_fetch V parts
    kv_specs = [
        pl.BlockSpec((None, None, Hkv, sub, D),
                     functools.partial(kv_index_map, j=j, kv01=kv01,
                                       part=p))
        for j in range(bs) for kv01 in (0, 1) for p in range(kv_fetch)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // bs, max_kv_tiles),
        in_specs=[
            pl.BlockSpec((bs, Hq, D), lambda g, kt, *_: (g, 0, 0)),
            *kv_specs,
        ],
        out_specs=pl.BlockSpec((bs, Hq, D), lambda g, kt, *_: (g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((bs, Hkv, G), jnp.float32),      # m
            pltpu.VMEM((bs, Hkv, G), jnp.float32),      # l
            pltpu.VMEM((bs, Hkv, G, D), jnp.float32),   # acc
        ],
    )

    def kernel(tile_rows_ref, seqlens_ref, dinfo_ref, q_ref, *rest):
        n_kv = 2 * kv_fetch * bs
        kv_refs, (out_ref, m_ref, l_ref, acc_ref) = rest[:n_kv], rest[n_kv:]
        _decode_kernel(tile_rows_ref, seqlens_ref, dinfo_ref,
                       q_ref, tuple(kv_refs), out_ref, m_ref, l_ref,
                       acc_ref, kv_tile=kv_tile, kv_fetch=kv_fetch,
                       seq_tile=bs,
                       sm_scale=sm_scale, window=window,
                       fp8_packed=fp8_packed)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        compiler_params=tpu_params(("parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(tile_rows, seqlens, dinfo, q,
      *([kv_cache] * (2 * kv_fetch * bs)))
