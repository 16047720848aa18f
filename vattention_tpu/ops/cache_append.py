"""KV append into the contiguous arena (``cache_flat`` equivalent).

TPU-native re-design of the reference's ``cache_flat`` CUDA kernel
(sarathi-lean/csrc/cache_kernels.cu:483-556), which appends K/V token rows
into the *contiguous* per-request cache slice without a block table.

Here each flattened batch token carries its absolute destination arena row
(computed host-side from the request's extent table + write position).
Because arena rows are row-major ``[R, Hkv, D]``, one token's K (or V) row
is one contiguous [Hkv*D] streamline; the kernel issues one DMA per
(token, K/V) from the staged VMEM rows into HBM.  Prefill chunks land in
consecutive rows, which the DMA engine coalesces naturally; invalid
(padding) tokens are skipped by predication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vattention_tpu.ops.utils import interpret_mode


def _append_kernel(rows_ref, linfo_ref, k_ref, v_ref, cache_ref, out_ref,
                   sem, *, tokens_per_step: int):
    layer = linfo_ref[0]
    # cache_ref is aliased with out_ref (same HBM buffer on TPU); all
    # access goes through out_ref so interpret mode also sees the writes.
    del cache_ref

    def body(t, _):
        row = rows_ref[t]

        @pl.when(row >= 0)
        def _():
            kcp = pltpu.make_async_copy(
                k_ref.at[t], out_ref.at[layer, 0, :, row], sem)
            vcp = pltpu.make_async_copy(
                v_ref.at[t], out_ref.at[layer, 1, :, row], sem)
            kcp.start()
            vcp.start()
            kcp.wait()
            vcp.wait()

        return 0

    jax.lax.fori_loop(0, tokens_per_step, body, 0)


@functools.partial(jax.jit, donate_argnums=(0,))
def cache_append(
    kv_cache: jax.Array,   # [L, 2, Hkv, R, D] (donated, updated in place)
    k_new: jax.Array,      # [T, Hkv, D]
    v_new: jax.Array,      # [T, Hkv, D]
    rows: jax.Array,       # [T] int32 destination arena row; -1 skips
    linfo: jax.Array,      # [1] int32: (layer,)
) -> jax.Array:
    T, Hkv, D = k_new.shape
    return pl.pallas_call(
        functools.partial(_append_kernel, tokens_per_step=T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={4: 0},  # kv_cache -> out (after 2 scalar args)
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret_mode(),
    )(rows, linfo, k_new, v_new, kv_cache)


def cache_append_scatter(kv_cache, k_new, v_new, rows, layer_idx,
                         scratch_row):
    """XLA-scatter append (TPU default).

    Mosaic cannot DMA a single arena row in the head-major layout (size-1
    slice on the sublane dim violates tiling), so the production append
    path lowers to XLA scatter on the donated cache buffer; XLA performs
    it in place.  Invalid (padding) tokens are routed to ``scratch_row``
    -- a sacrificial row past the arena the cache engines reserve -- so
    no read-blend is needed.  ``layer_idx``: [1] int32 array.  An
    aligned-tile RMW Pallas kernel is the planned optimization if scatter
    shows up in profiles.
    """
    l = layer_idx[0]
    safe_rows = jnp.where(rows >= 0, rows, scratch_row)
    k_hm = k_new.transpose(1, 0, 2).astype(kv_cache.dtype)  # [Hkv, T, D]
    v_hm = v_new.transpose(1, 0, 2).astype(kv_cache.dtype)
    kv_cache = kv_cache.at[l, 0, :, safe_rows].set(
        k_hm.transpose(1, 0, 2), unique_indices=False)
    kv_cache = kv_cache.at[l, 1, :, safe_rows].set(
        v_hm.transpose(1, 0, 2), unique_indices=False)
    return kv_cache


def cache_append_dus(kv_cache, k_new, v_new, rows, layer_idx,
                     scratch_row):
    """Decode-region append via per-token dynamic_update_slice.

    XLA lowers DUS on a donated carry to true in-place row writes (and,
    unlike the scatter formulation, compiles quickly and runs at memory
    speed).  T is small and static (the decode batch), so the scanned
    per-token loop stays tiny.  Padding tokens land on ``scratch_row``.
    """
    l = layer_idx[0]
    T = k_new.shape[0]
    k_hm = k_new.astype(kv_cache.dtype)
    v_hm = v_new.astype(kv_cache.dtype)

    def body(c, i):
        row = jnp.where(rows[i] >= 0, rows[i], scratch_row)
        # k_hm[i]: [Hkv, D] -> update block [1, 1, Hkv, 1, D]
        ku = k_hm[i][None, None, :, None, :]
        vu = v_hm[i][None, None, :, None, :]
        c = jax.lax.dynamic_update_slice(c, ku, (l, 0, 0, row, 0))
        c = jax.lax.dynamic_update_slice(c, vu, (l, 1, 0, row, 0))
        return c, 0

    kv_cache, _ = jax.lax.scan(body, kv_cache,
                               jnp.arange(T, dtype=jnp.int32))
    return kv_cache


def cache_append_jnp(kv_cache, k_new, v_new, rows, layer):
    """XLA-scatter fallback/reference (used to validate the kernel)."""
    safe_rows = jnp.where(rows >= 0, rows, 0)
    valid = (rows >= 0)[None, :, None]
    k_hm = k_new.transpose(1, 0, 2).astype(kv_cache.dtype)  # [Hkv, T, D]
    v_hm = v_new.transpose(1, 0, 2).astype(kv_cache.dtype)
    cur_k = kv_cache[layer, 0, :, safe_rows]  # advanced idx -> [T, Hkv, D]
    cur_v = kv_cache[layer, 1, :, safe_rows]
    new_k = jnp.where(valid, k_hm, cur_k.transpose(1, 0, 2))
    new_v = jnp.where(valid, v_hm, cur_v.transpose(1, 0, 2))
    kv_cache = kv_cache.at[layer, 0, :, safe_rows].set(
        new_k.transpose(1, 0, 2))
    kv_cache = kv_cache.at[layer, 1, :, safe_rows].set(
        new_v.transpose(1, 0, 2))
    return kv_cache
