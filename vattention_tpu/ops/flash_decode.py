"""Batched decode flash attention over the contiguous KV arena.

TPU-native equivalent of ``flash_attn_with_kvcache(q, cache, cache_seqlens,
cache_batch_idx)`` for the decode phase (ref: sarathi-lean
vattention_flashattention_wrapper.py:191-205): every scheduled sequence
contributes one query token that attends over its KV history in the arena.
The reference's ``cache_batch_idx`` gather generalizes to per-request
extent tables resolved in BlockSpec index_maps (scalar prefetch); the
Pallas pipeline double-buffers KV tile DMAs and elides fetches for tiles
beyond a sequence's length (clamped index trick).

Decode is HBM-bandwidth-bound: each KV row is read exactly once per step,
and whole-head tiles ([kv_tile, Hkv, D], row-major) make each DMA one
contiguous stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vattention_tpu.ops.utils import (MASK_VALUE, cdiv, interpret_mode,
                                      seg_row_lookup)


def _decode_kernel(
    # scalar prefetch
    seg_row_ref, seg_cum_ref, seqlens_ref, dinfo_ref,
    # blocks
    q_ref, k_refs, v_refs, out_ref,
    # scratch
    m_ref, l_ref, acc_ref,
    *, kv_tile: int, num_segments: int, sm_scale: float,
    window: int | None = None,
):
    if not isinstance(k_refs, (tuple, list)):
        k_refs, v_refs = (k_refs,), (v_refs,)
    b = pl.program_id(0)
    kt = pl.program_id(1)
    kv_len = seqlens_ref[b]
    n_tiles = pl.cdiv(kv_len, kv_tile)  # 0 when inactive

    @pl.when(kt == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(kt < n_tiles)
    def _compute():
        Hq, D = q_ref.shape
        Hkv = k_refs[0].shape[0]
        G = Hq // Hkv
        q = q_ref[...].reshape(Hkv, G, D)
        k = (k_refs[0][...] if len(k_refs) == 1 else
             jnp.concatenate([r[...] for r in k_refs], axis=1))
        # compute-dtype matmul (bf16 MXU, f32 accumulate); fp8 upcasts
        if k.dtype != q.dtype:
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [Hkv, G, kv_tile]
        s = s * sm_scale
        kv_pos = kt * kv_tile + jax.lax.broadcasted_iota(
            jnp.int32, (G, kv_tile), 1)
        valid = kv_pos < kv_len
        if window is not None:
            valid = jnp.logical_and(valid, kv_pos >= kv_len - window)
        s = jnp.where(valid[None], s, MASK_VALUE)

        m_prev = m_ref[...]  # [Hkv, G]
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1)
        v = (v_refs[0][...] if len(v_refs) == 1 else
             jnp.concatenate([r[...] for r in v_refs], axis=1))
        if v.dtype != q_ref.dtype:
            v = v.astype(q_ref.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [Hkv, G, D]
        acc_ref[...] = acc_ref[...] * alpha[..., None] + pv
        m_ref[...] = m_new

        @pl.when(kt == n_tiles - 1)
        def _finish():
            l = l_ref[...]
            l = jnp.where(l == 0.0, 1.0, l)
            o = acc_ref[...] / l[..., None]  # [Hkv, G, D]
            out_ref[...] = o.reshape(Hq, D).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kv_tile", "num_segments", "sm_scale",
                     "max_kv_tiles", "window", "kv_fetch"))
def flash_decode(
    q: jax.Array,            # [B, Hq, D]
    kv_cache: jax.Array,     # [L, 2, Hkv, R, D]
    seg_row: jax.Array,      # [B, S] int32
    seg_cum: jax.Array,      # [B, S+1] int32
    seqlens: jax.Array,      # [B] int32 (0 = inactive slot)
    dinfo: jax.Array,        # [1] int32: (layer,)
    *,
    kv_tile: int = 512,
    num_segments: int = 8,
    sm_scale: float | None = None,
    max_kv_tiles: int | None = None,
    window: int | None = None,
    kv_fetch: int = 1,
) -> jax.Array:
    """``kv_fetch`` splits the compute tile into block-aligned sub-tile
    DMAs (see flash_prefill) so wide tiles work on small-page arenas."""
    B, Hq, D = q.shape
    L, _, Hkv, R, _ = kv_cache.shape
    assert kv_tile % kv_fetch == 0
    sub = kv_tile // kv_fetch
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if max_kv_tiles is None:
        max_kv_tiles = cdiv(R, kv_tile)
    G = Hq // Hkv

    def kv_index_map(b, kt, seg_row_ref, seg_cum_ref, seqlens_ref,
                     dinfo_ref, kv01, part):
        layer = dinfo_ref[0]
        n_tiles = pl.cdiv(seqlens_ref[b], kv_tile)
        t_eff = jnp.clip(kt, 0, jnp.maximum(n_tiles - 1, 0))
        row = seg_row_lookup(t_eff * kv_tile + part * sub, seg_row_ref,
                             seg_cum_ref, num_segments, prefix=(b,))
        return (layer, kv01, 0, row // sub, 0)

    kv_specs = [
        pl.BlockSpec((None, None, Hkv, sub, D),
                     functools.partial(kv_index_map, kv01=kv01, part=p))
        for kv01 in (0, 1) for p in range(kv_fetch)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, max_kv_tiles),
        in_specs=[
            pl.BlockSpec((None, Hq, D), lambda b, kt, *_: (b, 0, 0)),
            *kv_specs,
        ],
        out_specs=pl.BlockSpec((None, Hq, D), lambda b, kt, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G), jnp.float32),      # m
            pltpu.VMEM((Hkv, G), jnp.float32),      # l
            pltpu.VMEM((Hkv, G, D), jnp.float32),   # acc
        ],
    )

    def kernel(seg_row_ref, seg_cum_ref, seqlens_ref, dinfo_ref, q_ref,
               *rest):
        kv_refs, (out_ref, m_ref, l_ref, acc_ref) = \
            rest[:2 * kv_fetch], rest[2 * kv_fetch:]
        _decode_kernel(seg_row_ref, seg_cum_ref, seqlens_ref, dinfo_ref,
                       q_ref, tuple(kv_refs[:kv_fetch]),
                       tuple(kv_refs[kv_fetch:]), out_ref, m_ref, l_ref,
                       acc_ref, kv_tile=kv_tile,
                       num_segments=num_segments, sm_scale=sm_scale,
                       window=window)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, D), q.dtype),
        interpret=interpret_mode(),
    )(seg_row, seg_cum, seqlens, dinfo, q,
      *([kv_cache] * (2 * kv_fetch)))
