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

Layout conventions (head-major -- contiguous per-head KV streams, TP
shards on the head axis, and Mosaic's batched-matmul batch dims line up):
  q        : [Hkv, G, Tq, D]   (G = Hq/Hkv query groups; Tq % q_tile == 0)
  kv_cache : [L, 2, Hkv, R, D] (stacked layers; 0=K, 1=V; R arena rows)
  out      : [Hkv, G, Tq, D]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vattention_tpu.ops.utils import (MASK_VALUE, cdiv, interpret_mode,
                                      seg_row_lookup)


def _prefill_kernel(
    # scalar prefetch
    seg_row_ref, seg_cum_ref, qinfo_ref,
    # blocks
    q_ref, k_ref, v_ref, out_ref,
    # scratch
    m_ref, l_ref, acc_ref,
    *, q_tile: int, kv_tile: int, num_segments: int, sm_scale: float,
    window: int | None = None,
):
    qt = pl.program_id(0)
    kt = pl.program_id(1)
    q_start = qinfo_ref[0]          # absolute position of q token 0
    kv_len = qinfo_ref[1]           # total kv rows to attend (history+chunk)

    n_kv_tiles = jnp.maximum(1, pl.cdiv(kv_len, kv_tile))
    # last tile this q tile may see under causality
    q_last_pos = q_start + (qt + 1) * q_tile - 1
    diag_tile = jnp.minimum(q_last_pos // kv_tile, n_kv_tiles - 1)

    @pl.when(kt == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(kt <= diag_tile)
    def _compute():
        Hkv, G, _, D = q_ref.shape
        q = q_ref[...].reshape(Hkv, G * q_tile, D)
        k = k_ref[...]  # [Hkv, kv_tile, D]
        s = jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [Hkv, G*q_tile, kv_tile]
        s = s * sm_scale

        # causal + length mask
        row = jax.lax.broadcasted_iota(jnp.int32, (G * q_tile, kv_tile), 0)
        q_pos = q_start + qt * q_tile + row % q_tile
        kv_pos = (kt * kv_tile
                  + jax.lax.broadcasted_iota(jnp.int32,
                                             (G * q_tile, kv_tile), 1))
        mask = jnp.logical_and(q_pos >= kv_pos, kv_pos < kv_len)
        if window is not None:
            mask = jnp.logical_and(mask, kv_pos > q_pos - window)
        s = jnp.where(mask[None], s, MASK_VALUE)

        m_prev = m_ref[...]  # [Hkv, G*q_tile]
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1)
        v = v_ref[...]  # [Hkv, kv_tile, D]
        pv = jax.lax.dot_general(
            p, v.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [Hkv, G*q_tile, D]
        acc_ref[...] = acc_ref[...] * alpha[..., None] + pv
        m_ref[...] = m_new

    @pl.when(kt == pl.num_programs(1) - 1)
    def _finish():
        Hkv, G, _, D = q_ref.shape
        l = l_ref[...]
        l = jnp.where(l == 0.0, 1.0, l)
        o = acc_ref[...] / l[..., None]  # [Hkv, G*q_tile, D]
        out_ref[...] = o.reshape(Hkv, G, q_tile, D).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("q_tile", "kv_tile", "num_segments",
                     "sm_scale", "max_kv_tiles", "window"))
def flash_prefill(
    q: jax.Array,            # [Tq, Hq, D], Tq % q_tile == 0
    kv_cache: jax.Array,     # [L, 2, Hkv, R, D]
    seg_row: jax.Array,      # [S] int32 arena row of each extent
    seg_cum: jax.Array,      # [S+1] int32 cumulative tokens before extent
    qinfo: jax.Array,        # [3] int32: (q_start, kv_len, layer)
    *,
    q_tile: int = 128,
    kv_tile: int = 256,
    num_segments: int = 8,
    sm_scale: float | None = None,
    max_kv_tiles: int | None = None,
    window: int | None = None,
) -> jax.Array:
    Tq, Hq, D = q.shape
    L, _, Hkv, R, _ = kv_cache.shape
    assert Tq % q_tile == 0, (Tq, q_tile)
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    if max_kv_tiles is None:
        max_kv_tiles = cdiv(R, kv_tile)
    n_q_tiles = Tq // q_tile
    G = Hq // Hkv
    q_hm = q.reshape(Tq, Hkv, G, D).transpose(1, 2, 0, 3)

    def kv_index_map(qt, kt, seg_row_ref, seg_cum_ref, qinfo_ref, kv01):
        layer = qinfo_ref[2]
        kv_len = qinfo_ref[1]
        n_kv_tiles = jnp.maximum(1, pl.cdiv(kv_len, kv_tile))
        q_last_pos = qinfo_ref[0] + (qt + 1) * q_tile - 1
        diag_tile = jnp.minimum(q_last_pos // kv_tile, n_kv_tiles - 1)
        t_eff = jnp.minimum(kt, diag_tile)  # clamp: repeats elide the DMA
        row = seg_row_lookup(t_eff * kv_tile, seg_row_ref, seg_cum_ref,
                             num_segments)
        return (layer, kv01, 0, row // kv_tile, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_q_tiles, max_kv_tiles),
        in_specs=[
            pl.BlockSpec((Hkv, G, q_tile, D),
                         lambda qt, kt, *_: (0, 0, qt, 0)),
            pl.BlockSpec((None, None, Hkv, kv_tile, D),
                         functools.partial(kv_index_map, kv01=0)),
            pl.BlockSpec((None, None, Hkv, kv_tile, D),
                         functools.partial(kv_index_map, kv01=1)),
        ],
        out_specs=pl.BlockSpec((Hkv, G, q_tile, D),
                               lambda qt, kt, *_: (0, 0, qt, 0)),
        scratch_shapes=[
            pltpu.VMEM((Hkv, G * q_tile), jnp.float32),     # m
            pltpu.VMEM((Hkv, G * q_tile), jnp.float32),     # l
            pltpu.VMEM((Hkv, G * q_tile, D), jnp.float32),  # acc
        ],
    )
    kernel = functools.partial(
        _prefill_kernel, q_tile=q_tile, kv_tile=kv_tile,
        num_segments=num_segments, sm_scale=sm_scale, window=window)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Hkv, G, Tq, D), q.dtype),
        interpret=interpret_mode(),
    )(seg_row, seg_cum, qinfo, q_hm, kv_cache, kv_cache)
    return out.transpose(2, 0, 1, 3).reshape(Tq, Hq, D)
