"""Paged attention backend (block tables) -- A/B baseline.

ref: sarathi-lean flash_attention_wrapper.py:16-314 (FA_PAGED).
"""

from __future__ import annotations

import jax.numpy as jnp

from vattention_tpu.model_executor.step_inputs import StepInputs
from vattention_tpu.ops.cache_append import (WINDOW,
                                             cache_append_run,
                                             cache_append_tokens)
from vattention_tpu.ops.paged_attention import (paged_flash_decode,
                                                paged_flash_prefill_multi)
from vattention_tpu.ops.utils import (cdiv, icdiv,
                                      kv_tile_bucket_switch)


class PagedAttentionBackend:
    def __init__(self, *, block_size: int, max_context_len: int,
                 scratch_row: int, q_tile: int = 128,
                 kv_scale=None):
        # int8 KV scale -- see VattnAttentionBackend.__init__
        self.kv_scale = kv_scale
        self.scratch_row = scratch_row
        self.q_tile = q_tile
        self.block_size = block_size
        self.max_kv_tiles = cdiv(max_context_len, block_size)
        import os as _os

        # small-block pools fetch several blocks per prefill compute
        # tile (fi_paged_16 analog: 256-wide MXU tiles, one DMA per
        # block).  PAGED_WIDE_TILE widens the compute tile past the
        # default 256 (e.g. 512 runs fa_paged_256 at the arena's MXU
        # tile width, 2 block DMAs per tile) -- the strongest-baseline
        # control for the contiguity-vs-tile-width decomposition.
        wide_pref = int(_os.environ.get("PAGED_WIDE_TILE", "256"))
        self.pre_kv_fetch = max(1, min(16, wide_pref // block_size))
        self.pre_max_kv_tiles = cdiv(self.max_kv_tiles,
                                     self.pre_kv_fetch)
        # sub-WINDOW blocks let different seqs' decode rows share a
        # 32-row RMW window -> the batched append must serialize
        self.append_serialize = block_size % WINDOW != 0

    def append_kv(self, kv_cache, k, v, inputs: StepInputs, layer_idx,
                  n_prefill_tokens: int = 0):
        """layer_idx: [1] int32 array.

        All cache writes go through Pallas RMW kernels so the arena sees
        exactly one XLA layout (scatter/DUS formulations make layout
        assignment relayout-copy the whole arena around the attention
        custom calls).  Prefill chunks append as contiguous extent runs;
        decode rows append per token.
        """
        from vattention_tpu.model_executor.attention.vattn_backend import (
            VattnAttentionBackend)

        k = VattnAttentionBackend._pad_heads(k, kv_cache.shape[-1])
        v = VattnAttentionBackend._pad_heads(v, kv_cache.shape[-1])
        if self.kv_scale is not None:
            k = VattnAttentionBackend._quantize_int8(self, k)
            v = VattnAttentionBackend._quantize_int8(self, v)
        else:
            k = VattnAttentionBackend._flush_fp8_subnormals(
                k, kv_cache.dtype)
            v = VattnAttentionBackend._flush_fp8_subnormals(
                v, kv_cache.dtype)
        rows = inputs.append_rows
        if n_prefill_tokens > 0:
            pad = jnp.zeros((WINDOW,) + k.shape[1:], k.dtype)
            kp = jnp.concatenate([pad, k[:n_prefill_tokens], pad], axis=0)
            vp = jnp.concatenate([pad, v[:n_prefill_tokens], pad], axis=0)
            max_windows = n_prefill_tokens // WINDOW + 2
            kv_cache = cache_append_run(
                kv_cache, kp, vp, inputs.pre_runs,
                layer_idx.astype(jnp.int32), max_windows=max_windows)
        if k.shape[0] > n_prefill_tokens:
            kv_cache = cache_append_tokens(
                kv_cache, k[n_prefill_tokens:], v[n_prefill_tokens:],
                rows[n_prefill_tokens:], layer_idx.astype(jnp.int32),
                serialize=self.append_serialize)
        return kv_cache

    def attend(self, q, kv_cache, inputs: StepInputs, layer_idx,
               n_prefill_tokens: int, *, sm_scale: float,
               kv_len_hint=None):
        from vattention_tpu.model_executor.attention.vattn_backend import (
            VattnAttentionBackend)

        D = q.shape[-1]
        q = VattnAttentionBackend._pad_heads(q, kv_cache.shape[-1])
        if self.kv_scale is not None:
            sm_scale = sm_scale * self.kv_scale
        pre_hint, dec_hint = kv_len_hint or (None, None)
        outs = []
        if n_prefill_tokens > 0:
            tiles = self.pre_max_kv_tiles
            if pre_hint:
                tiles = min(tiles, cdiv(
                    pre_hint, self.block_size * self.pre_kv_fetch))

            def run_prefill(b):
                return paged_flash_prefill_multi(
                    q[:n_prefill_tokens], kv_cache, inputs.pre_seg_row,
                    inputs.pre_qinfo, inputs.qt_run,
                    layer_idx.astype(jnp.int32),
                    q_tile=self.q_tile, block_size=self.block_size,
                    sm_scale=sm_scale, max_kv_tiles=b,
                    kv_fetch=self.pre_kv_fetch)

            # in-program live-depth bucket (same tail-killing treatment
            # as the vattn backend -- the A/B must stay like-for-like)
            pre_need = icdiv(jnp.max(inputs.pre_qinfo[:, 1]),
                             self.block_size * self.pre_kv_fetch)
            outs.append(kv_tile_bucket_switch(pre_need, tiles,
                                              run_prefill))
        if q.shape[0] > n_prefill_tokens:
            tiles = self.max_kv_tiles
            if dec_hint:
                tiles = min(tiles, cdiv(dec_hint, self.block_size))

            def run_decode(b):
                return paged_flash_decode(
                    q[n_prefill_tokens:], kv_cache, inputs.dec_seg_row,
                    inputs.dec_seqlens, layer_idx.astype(jnp.int32),
                    block_size=self.block_size, sm_scale=sm_scale,
                    max_kv_tiles=b)

            dec_need = icdiv(jnp.max(inputs.dec_seqlens),
                             self.block_size)
            outs.append(kv_tile_bucket_switch(dec_need, tiles,
                                              run_decode))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        out = out[..., :D]
        if self.kv_scale is not None:
            out = out * jnp.asarray(self.kv_scale, out.dtype)
        return out
