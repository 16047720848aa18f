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

from vattention_tpu.ops.utils import cdiv, interpret_mode, tpu_params


WINDOW = 32  # aligned row window (covers f32/bf16/fp8 sublane tiles)

# VMEM budget for the batched-append staging windows (2 x chunk x Hkv x
# WINDOW x D).  Batches larger than the budget allows are split across
# grid steps instead of growing the scratch past the scoped-VMEM limit.
APPEND_VMEM_BUDGET = 48 * 2**20


def _rmw_batch_kernel(rows_ref, linfo_ref, k_ref, v_ref, cache_ref,
                      out_ref, kwin, vwin, ksem, vsem, *, rows_total: int,
                      serialize: bool = False):
    """Batched append via aligned-window read-modify-write.

    Mosaic rejects size-1 sublane DMA slices, and letting XLA scatter/DUS
    into the cache makes layout assignment pick a scatter-friendly tiling
    and relayout-copy the whole arena around every pallas call (observed:
    220ms/step on a 2GB arena).  Touching the cache ONLY through pallas
    keeps one layout; each token RMWs its aligned 32-row window (~4KB
    per token of extra traffic -- noise).

    ONE grid step handles every token: all 2T window reads are issued as
    concurrent DMAs, blended in VMEM, and written back concurrently --
    DMA latency is paid once, not 4x per token (the per-token-grid-step
    formulation cost ~90us/layer at B=24; this runs at DMA speed).
    Window aliasing between tokens is impossible when block_tokens is a
    multiple of WINDOW (slots own disjoint block-aligned extents and a
    slot appends at most one token per step); for sub-WINDOW blocks the
    caller sets ``serialize=True`` and each token's RMW completes before
    the next begins (aliased windows then stay coherent).
    """
    del cache_ref  # aliased with out_ref
    layer = linfo_ref[0]
    T = kwin.shape[0]  # tokens per grid step (chunk)
    g = pl.program_id(0)

    def base_off(t):
        row = rows_ref[g * T + t]
        base = jnp.minimum((row // WINDOW) * WINDOW,
                           jnp.maximum(rows_total - WINDOW, 0))
        return pl.multiple_of(base, WINDOW), row - base

    if serialize:
        for t in range(T):
            @pl.when(rows_ref[g * T + t] >= 0)
            def _(t=t):
                base, off = base_off(t)
                kin = pltpu.make_async_copy(
                    out_ref.at[layer, 0, :, pl.ds(base, WINDOW), :],
                    kwin.at[t], ksem.at[t])
                vin = pltpu.make_async_copy(
                    out_ref.at[layer, 1, :, pl.ds(base, WINDOW), :],
                    vwin.at[t], vsem.at[t])
                kin.start(); vin.start(); kin.wait(); vin.wait()
                sel = jax.lax.broadcasted_iota(
                    jnp.int32, (1, WINDOW, 1), 1) == off
                kwin[t] = jnp.where(
                    sel, k_ref[t][:, None, :].astype(kwin.dtype), kwin[t])
                vwin[t] = jnp.where(
                    sel, v_ref[t][:, None, :].astype(vwin.dtype), vwin[t])
                kout = pltpu.make_async_copy(
                    kwin.at[t],
                    out_ref.at[layer, 0, :, pl.ds(base, WINDOW), :],
                    ksem.at[t])
                vout = pltpu.make_async_copy(
                    vwin.at[t],
                    out_ref.at[layer, 1, :, pl.ds(base, WINDOW), :],
                    vsem.at[t])
                kout.start(); vout.start(); kout.wait(); vout.wait()
        return

    for t in range(T):
        @pl.when(rows_ref[g * T + t] >= 0)
        def _(t=t):
            base, _ = base_off(t)
            pltpu.make_async_copy(
                out_ref.at[layer, 0, :, pl.ds(base, WINDOW), :],
                kwin.at[t], ksem.at[t]).start()
            pltpu.make_async_copy(
                out_ref.at[layer, 1, :, pl.ds(base, WINDOW), :],
                vwin.at[t], vsem.at[t]).start()

    for t in range(T):
        @pl.when(rows_ref[g * T + t] >= 0)
        def _(t=t):
            base, off = base_off(t)
            pltpu.make_async_copy(
                out_ref.at[layer, 0, :, pl.ds(base, WINDOW), :],
                kwin.at[t], ksem.at[t]).wait()
            pltpu.make_async_copy(
                out_ref.at[layer, 1, :, pl.ds(base, WINDOW), :],
                vwin.at[t], vsem.at[t]).wait()
            # masked whole-window select (dynamic single-sublane stores
            # need alignment proofs Mosaic cannot make)
            sel = jax.lax.broadcasted_iota(
                jnp.int32, (1, WINDOW, 1), 1) == off
            kwin[t] = jnp.where(sel, k_ref[t][:, None, :].astype(kwin.dtype),
                                kwin[t])
            vwin[t] = jnp.where(sel, v_ref[t][:, None, :].astype(vwin.dtype),
                                vwin[t])
            pltpu.make_async_copy(
                kwin.at[t],
                out_ref.at[layer, 0, :, pl.ds(base, WINDOW), :],
                ksem.at[t]).start()
            pltpu.make_async_copy(
                vwin.at[t],
                out_ref.at[layer, 1, :, pl.ds(base, WINDOW), :],
                vsem.at[t]).start()

    for t in range(T):
        @pl.when(rows_ref[g * T + t] >= 0)
        def _(t=t):
            base, _ = base_off(t)
            pltpu.make_async_copy(
                kwin.at[t],
                out_ref.at[layer, 0, :, pl.ds(base, WINDOW), :],
                ksem.at[t]).wait()
            pltpu.make_async_copy(
                vwin.at[t],
                out_ref.at[layer, 1, :, pl.ds(base, WINDOW), :],
                vsem.at[t]).wait()


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("serialize",))
def cache_append_tokens(
    kv_cache: jax.Array,   # [L, 2, Hkv, R, D] (donated, updated in place)
    k_new: jax.Array,      # [T, Hkv, D]
    v_new: jax.Array,      # [T, Hkv, D]
    rows: jax.Array,       # [T] int32 destination arena row; -1 skips
    linfo: jax.Array,      # [1] int32: (layer,)
    *,
    serialize: bool = False,   # True when rows may share a 32-row window
) -> jax.Array:
    T, Hkv, D = k_new.shape
    R = kv_cache.shape[3]
    # chunk the batch so the staging windows fit the VMEM budget
    # (2 x chunk x Hkv x WINDOW x D of cache dtype per buffer pair)
    per_tok = 2 * Hkv * WINDOW * D * kv_cache.dtype.itemsize
    chunk = max(1, min(T, APPEND_VMEM_BUDGET // per_tok))
    n_chunks = cdiv(T, chunk)
    if n_chunks * chunk != T:
        pad = n_chunks * chunk - T
        k_new = jnp.pad(k_new, ((0, pad), (0, 0), (0, 0)))
        v_new = jnp.pad(v_new, ((0, pad), (0, 0), (0, 0)))
        rows = jnp.pad(rows, (0, pad), constant_values=-1)
    return pl.pallas_call(
        functools.partial(_rmw_batch_kernel, rows_total=R,
                          serialize=serialize),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec((chunk, Hkv, D), lambda g, *_: (g, 0, 0)),
                pl.BlockSpec((chunk, Hkv, D), lambda g, *_: (g, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((chunk, Hkv, WINDOW, D), kv_cache.dtype),
                pltpu.VMEM((chunk, Hkv, WINDOW, D), kv_cache.dtype),
                pltpu.SemaphoreType.DMA((chunk,)),
                pltpu.SemaphoreType.DMA((chunk,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={4: 0},
        compiler_params=tpu_params(has_side_effects=True),
        interpret=interpret_mode(),
    )(rows, linfo, k_new, v_new, kv_cache)


def _rmw_run_kernel(runinfo_ref, linfo_ref, k_ref, v_ref, cache_ref,
                    out_ref, kbuf, vbuf, sem, *, rows_total: int):
    """Contiguous-run append: every 32-row window overlapping a run is
    RMW'd, with covered rows replaced from the (32-padded) staged K/V.

    runinfo: [S, 3] = (dst_row0, src_tok0, n_tokens) per extent run of
    the prefill chunk; ``k_ref`` is padded with WINDOW rows at BOTH ends
    so shifted window slices stay in bounds (mask handles the edges).
    """
    del cache_ref
    s = pl.program_id(0)
    w = pl.program_id(1)
    dst0 = runinfo_ref[s, 0]
    src0 = runinfo_ref[s, 1]
    n = runinfo_ref[s, 2]
    layer = linfo_ref[0]
    base0 = (dst0 // WINDOW) * WINDOW
    base = base0 + w * WINDOW
    base = jnp.minimum(base, jnp.maximum(rows_total - WINDOW, 0))
    base = pl.multiple_of(base, WINDOW)
    a = jnp.maximum(dst0, base)
    b = jnp.minimum(dst0 + n, base + WINDOW)

    full_cover = jnp.logical_and(a == base, b == base + WINDOW)

    @pl.when(jnp.logical_and(a < b, jnp.logical_not(full_cover)))
    def _partial():
        kin = pltpu.make_async_copy(
            out_ref.at[layer, 0, :, pl.ds(base, WINDOW), :], kbuf, sem)
        kin.start()
        vin = pltpu.make_async_copy(
            out_ref.at[layer, 1, :, pl.ds(base, WINDOW), :], vbuf, sem)
        vin.start()
        # staged rows for this window: token index of window row i is
        # (base + i) - dst0 + src0; +WINDOW for the padding offset
        start = base - dst0 + src0 + WINDOW
        kin.wait()
        vin.wait()
        knew = k_ref[pl.ds(start, WINDOW)]  # [WINDOW, Hkv, D]
        vnew = v_ref[pl.ds(start, WINDOW)]
        ridx = base + jax.lax.broadcasted_iota(
            jnp.int32, (WINDOW, 1, 1), 0)
        mask = jnp.logical_and(ridx >= a, ridx < b)
        kblend = jnp.where(mask, knew.astype(kbuf.dtype),
                           jnp.transpose(kbuf[...], (1, 0, 2)))
        vblend = jnp.where(mask, vnew.astype(vbuf.dtype),
                           jnp.transpose(vbuf[...], (1, 0, 2)))
        kbuf[...] = jnp.transpose(kblend, (1, 0, 2))
        vbuf[...] = jnp.transpose(vblend, (1, 0, 2))

    @pl.when(full_cover)
    def _full():
        # interior window: new data covers all 32 rows -- no read, no
        # blend; half the RMW traffic and DMA latency chain disappears
        # for every window but a run's first and last
        start = base - dst0 + src0 + WINDOW
        kbuf[...] = jnp.transpose(
            k_ref[pl.ds(start, WINDOW)].astype(kbuf.dtype), (1, 0, 2))
        vbuf[...] = jnp.transpose(
            v_ref[pl.ds(start, WINDOW)].astype(vbuf.dtype), (1, 0, 2))

    @pl.when(a < b)
    def _writeback():
        kout = pltpu.make_async_copy(
            kbuf, out_ref.at[layer, 0, :, pl.ds(base, WINDOW), :], sem)
        kout.start()
        vout = pltpu.make_async_copy(
            vbuf, out_ref.at[layer, 1, :, pl.ds(base, WINDOW), :], sem)
        vout.start()
        kout.wait()
        vout.wait()


@functools.partial(jax.jit, static_argnames=("max_windows",),
                   donate_argnums=(0,))
def cache_append_run(
    kv_cache: jax.Array,   # [L, 2, Hkv, R, D] (donated)
    k_padded: jax.Array,   # [WINDOW + T + WINDOW, Hkv, D] (pad both ends)
    v_padded: jax.Array,
    runinfo: jax.Array,    # [S, 3] int32 (dst_row0, src_tok0, n) per run
    linfo: jax.Array,      # [1] int32 (layer,)
    *,
    max_windows: int,
) -> jax.Array:
    _, Hkv, D = k_padded.shape
    R = kv_cache.shape[3]
    S = runinfo.shape[0]
    return pl.pallas_call(
        functools.partial(_rmw_run_kernel, rows_total=R),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(S, max_windows),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((Hkv, WINDOW, D), kv_cache.dtype),
                pltpu.VMEM((Hkv, WINDOW, D), kv_cache.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={4: 0},
        compiler_params=tpu_params(has_side_effects=True),
        interpret=interpret_mode(),
    )(runinfo, linfo, k_padded, v_padded, kv_cache)


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
