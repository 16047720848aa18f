"""Relocation-plan application: ordered block moves inside the KV arena.

Device-side half of the allocator's defragmenter (memory/allocator.py
``RelocationPlan``): each move copies one KV block (``block_tokens`` arena
rows, across all layers and K+V) from ``src`` to ``dst``.  The plan's
sequential order is correctness-critical (the planner guarantees a move's
destination holds no live data *at that point in the plan*), and a Pallas
grid executes sequentially per core, so a grid over moves preserves it.

This is the TPU analog of the reference's background cuMemMap/Unmap
remapping (vattention.cu:268-323): dispatched asynchronously by the cache
engine and overlapped with the forward pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vattention_tpu.ops.utils import interpret_mode, tpu_params


def _copy_kernel(src_ref, dst_ref, n_ref, cache_ref, out_ref, scratch, sem,
                 *, block_tokens: int, num_layers: int):
    # cache_ref is aliased with out_ref; access everything through
    # out_ref so interpret mode also sees a consistent buffer.
    del cache_ref
    i = pl.program_id(0)

    @pl.when(i < n_ref[0])
    def _():
        src = src_ref[i] * block_tokens
        dst = dst_ref[i] * block_tokens

        def body(lk, _):
            l = lk // 2
            kv = lk % 2
            in_cp = pltpu.make_async_copy(
                out_ref.at[l, kv, :, pl.ds(src, block_tokens)],
                scratch, sem)
            in_cp.start()
            in_cp.wait()
            out_cp = pltpu.make_async_copy(
                scratch,
                out_ref.at[l, kv, :, pl.ds(dst, block_tokens)], sem)
            out_cp.start()
            out_cp.wait()
            return 0

        jax.lax.fori_loop(0, 2 * num_layers, body, 0)


@functools.partial(jax.jit, static_argnames=("block_tokens",),
                   donate_argnums=(0,))
def apply_relocations(
    kv_cache: jax.Array,    # [L, 2, Hkv, R, D] (donated, moved in place)
    src_blocks: jax.Array,  # [M] int32 (padded; entries >= n ignored)
    dst_blocks: jax.Array,  # [M] int32
    n_moves: jax.Array,     # [1] int32
    *,
    block_tokens: int,
) -> jax.Array:
    L, _, Hkv, R, D = kv_cache.shape
    M = src_blocks.shape[0]
    return pl.pallas_call(
        functools.partial(_copy_kernel, block_tokens=block_tokens,
                          num_layers=L),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(M,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((Hkv, block_tokens, D), kv_cache.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={3: 0},
        compiler_params=tpu_params(has_side_effects=True),
        interpret=interpret_mode(),
    )(src_blocks, dst_blocks, n_moves, kv_cache)
