"""vATTN attention backend: dense Pallas kernels over the contiguous arena.

TPU analog of the reference's vattention FlashAttention wrapper
(sarathi-lean vattention_flashattention_wrapper.py:17-224): prefill chunk
attends its contiguous slab, decode batch attends via per-slot extent
tables; K/V appended with the cache_flat-equivalent kernel beforehand.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vattention_tpu.model_executor.step_inputs import StepInputs
from vattention_tpu.ops.cache_append import (WINDOW,
                                             cache_append_run,
                                             cache_append_tokens)
from vattention_tpu.ops.flash_decode import flash_decode
from vattention_tpu.ops.flash_prefill import (flash_prefill,
                                              flash_prefill_multi)
from vattention_tpu.ops.utils import (cdiv, fp8_packed_enabled, icdiv,
                                      kv_tile_bucket_switch,
                                      select_kv_tile,
                                      tile_rows_from_segments_jnp)


class VattnAttentionBackend:
    """Holds static kernel-shape choices for a model/cache config."""

    def __init__(self, *, block_tokens: int, num_segments: int,
                 max_context_len: int, arena_rows: int,
                 q_tile: int = 128, kv_tile: Optional[int] = None,
                 scratch_row: Optional[int] = None,
                 sliding_window: Optional[int] = None,
                 kv_scale: Optional[float] = None):
        # int8 KV quantization scale (kv_quant="int8"): K/V are stored
        # as round(x / kv_scale) int8.  The dequant costs NOTHING per
        # element inside the kernels -- the K scale folds into sm_scale
        # (scores = q.K_int * (sm_scale*kv_scale)) and the V scale
        # multiplies the small attention output once (softmax
        # normalization is scale-invariant in V's magnitude).  int8 ->
        # bf16 widening is a native VPU op the decode stream runs at
        # 64% of the byte roofline, vs 30% for the fp8 manual widening
        # (docs/PERF.md "fp8 convert cliff").
        self.kv_scale = kv_scale
        self.sliding_window = sliding_window
        self.scratch_row = (arena_rows if scratch_row is None
                            else scratch_row)
        # sub-WINDOW blocks let different slots' decode rows share a
        # 32-row RMW window -> the batched append must serialize
        self.append_serialize = block_tokens % WINDOW != 0
        self.q_tile = q_tile
        import os as _os

        # measurement knob: cap the compute-tile width (e.g.
        # VATTN_WIDE_TILE=256 reproduces the paged backend's tiling on
        # the arena for like-for-like kernel comparisons)
        wide_pref = int(_os.environ.get("VATTN_WIDE_TILE", "512"))
        self.kv_tile = kv_tile or select_kv_tile(block_tokens, wide_pref)
        # prefill wants 512-wide MXU tiles; when extents are only aligned
        # to a smaller block size, fetch the compute tile as several
        # block-aligned sub-tile DMAs (kv_fetch)
        self.wide_kv_fetch = max(1, min(8, wide_pref // self.kv_tile))
        self.wide_kv_tile = self.kv_tile * self.wide_kv_fetch
        self.pre_sub = self.wide_kv_tile // self.wide_kv_fetch
        self.num_segments = num_segments
        # tiles bounded by the max context (not arena size) to keep the
        # skipped-tile tail of the grid short
        self.max_kv_tiles = cdiv(min(max_context_len, arena_rows),
                                 self.kv_tile)
        self.wide_max_kv_tiles = cdiv(min(max_context_len, arena_rows),
                                     self.wide_kv_tile)
        self.pre_n_sub = self.wide_max_kv_tiles * self.wide_kv_fetch
        # decode tiling: 256-token compute tiles measured fastest on v5e
        # (bigger tiles raise the per-stream VMEM floor without more
        # bandwidth; decode is per-seq-DMA-bound, not MXU-bound).  The
        # decode tile is chosen independently of the prefill tile: large
        # blocks (2MB pages -> 4096-token blocks) still decode at 256
        # (512-wide decode tiles measured ~45% slower at 64K depth)
        dec_pref = int(_os.environ.get("VATTN_DEC_TILE", "256"))
        dec_base = select_kv_tile(block_tokens, dec_pref)
        self.dec_kv_fetch = max(1, min(8, dec_pref // dec_base))
        self.dec_kv_tile = dec_base * self.dec_kv_fetch
        self.dec_sub = dec_base
        self.dec_max_kv_tiles = cdiv(min(max_context_len, arena_rows),
                                     self.dec_kv_tile)
        self.dec_n_sub = self.dec_max_kv_tiles * self.dec_kv_fetch

    def _quantize_int8(self, x):
        s = jnp.float32(self.kv_scale)
        q = jnp.round(x.astype(jnp.float32) / s)
        return jnp.clip(q, -127, 127).astype(jnp.int8)

    def _eff_sm_scale(self, sm_scale: float) -> float:
        return (sm_scale * self.kv_scale if self.kv_scale is not None
                else sm_scale)

    def _descale_out(self, out):
        return (out * jnp.asarray(self.kv_scale, out.dtype)
                if self.kv_scale is not None else out)

    # values below this round to an e4m3 denormal (largest denormal
    # 7*2^-9; midpoint to the min normal 2^-6 is 15*2^-10)
    FP8_SUBNORMAL_CUTOFF = 15.0 * 2.0 ** -10

    @staticmethod
    def _flush_fp8_subnormals(x, cache_dtype):
        """Zero anything that would store as an e4m3 DENORMAL pattern.

        Two ops on the small per-step append tensor buy the packed fast
        read path (ops/utils.upcast_kv_packed exact=False): with no
        denormal patterns in the arena, rebias is one bf16 multiply per
        pair instead of the magic-number select, and the 64K fp8 decode
        stream stops being VPU-bound.  Quality-wise the flushed values
        are |x| < 0.0147 -- below e4m3's normal range, i.e. noise at
        K/V magnitudes -- and the fp8 ppl gate (tests/test_fp8_quality)
        runs through this path.
        """
        if jnp.dtype(cache_dtype) != jnp.float8_e4m3fn:
            return x
        cut = VattnAttentionBackend.FP8_SUBNORMAL_CUTOFF
        return jnp.where(jnp.abs(x.astype(jnp.float32)) < cut,
                         jnp.zeros((), x.dtype), x)

    @staticmethod
    def _pad_heads(x, Dp: int):
        """Zero-pad the head (lane) dim to the arena's 128-aligned width
        (sub-128 head dims cannot be DMA'd; zeros are score-neutral)."""
        D = x.shape[-1]
        if D == Dp:
            return x
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Dp - D)])

    def append_kv(self, kv_cache, k, v, inputs: StepInputs, layer_idx,
                  n_prefill_tokens: int = 0):
        """layer_idx: [1] int32 array.

        All cache writes go through Pallas RMW kernels so the arena sees
        exactly one XLA layout (scatter/DUS formulations make layout
        assignment relayout-copy the whole arena around the attention
        custom calls).  Prefill chunks append as contiguous extent runs;
        decode rows append per token.
        """
        k = self._pad_heads(k, kv_cache.shape[-1])
        v = self._pad_heads(v, kv_cache.shape[-1])
        if self.kv_scale is not None:
            k = self._quantize_int8(k)
            v = self._quantize_int8(v)
        else:
            k = self._flush_fp8_subnormals(k, kv_cache.dtype)
            v = self._flush_fp8_subnormals(v, kv_cache.dtype)
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
        """q: [T, Hq, D] -> [T, Hq, D].  ``n_prefill_tokens`` is static.

        ``kv_len_hint``: optional static (prefill_kv_len, decode_kv_len)
        upper bounds in TOKENS (pow2-bucketed by the model runner) that
        cap the kernels' kv-tile grids to this step's live depth --
        without it the grids cover max_model_len, and the skipped-tile
        tail's fixed cost (~2-3us/step/layer) is pure overhead at short
        contexts.
        """
        D = q.shape[-1]
        q = self._pad_heads(q, kv_cache.shape[-1])
        sm_scale = self._eff_sm_scale(sm_scale)
        pre_hint, dec_hint = kv_len_hint or (None, None)
        outs = []
        if n_prefill_tokens > 0:
            tiles = self.wide_max_kv_tiles
            if pre_hint:
                tiles = min(tiles, cdiv(pre_hint, self.wide_kv_tile))

            def run_prefill(b):
                return flash_prefill_multi(
                    q[:n_prefill_tokens], kv_cache,
                    inputs.pre_seg_row, inputs.pre_seg_cum,
                    inputs.pre_qinfo, inputs.qt_run,
                    layer_idx.astype(jnp.int32),
                    inputs.pre_tile_rows,
                    q_tile=self.q_tile, kv_tile=self.wide_kv_tile,
                    num_segments=self.num_segments, sm_scale=sm_scale,
                    max_kv_tiles=b,
                    window=self.sliding_window,
                    kv_fetch=self.wide_kv_fetch,
                    fp8_packed=fp8_packed_enabled(kv_cache.dtype))

            # in-program pow2 bucket over the step's LIVE max depth: the
            # static grid otherwise walks max_model_len every step and
            # the skipped tail dominates long-context prefill (measured
            # ~90% of prefill step time at 128K, docs/PERF.md)
            pre_need = icdiv(jnp.max(inputs.pre_qinfo[:, 1]),
                                self.wide_kv_tile)
            outs.append(kv_tile_bucket_switch(pre_need, tiles,
                                              run_prefill))
        if q.shape[0] > n_prefill_tokens:
            Bd = q.shape[0] - n_prefill_tokens
            tile_rows = inputs.dec_tile_rows
            if tile_rows is None:
                tile_rows = tile_rows_from_segments_jnp(
                    inputs.dec_seg_row, inputs.dec_seg_cum,
                    self.dec_sub, self.dec_n_sub)
            tiles = self.dec_max_kv_tiles
            if dec_hint:
                tiles = min(tiles, cdiv(dec_hint, self.dec_kv_tile))

            def run_decode(b):
                return flash_decode(
                    q[n_prefill_tokens:], kv_cache,
                    tile_rows, inputs.dec_seqlens,
                    layer_idx.astype(jnp.int32),
                    kv_tile=self.dec_kv_tile,
                    sm_scale=sm_scale, max_kv_tiles=b,
                    window=self.sliding_window,
                    kv_fetch=self.dec_kv_fetch,
                    seq_tile=self.decode_seq_tile(
                        Bd, kv_cache.shape[2], kv_cache.shape[4],
                        jnp.dtype(kv_cache.dtype).itemsize),
                    fp8_packed=fp8_packed_enabled(kv_cache.dtype))

            dec_need = icdiv(jnp.max(inputs.dec_seqlens),
                                self.dec_kv_tile)
            outs.append(kv_tile_bucket_switch(dec_need, tiles,
                                              run_decode))
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return self._descale_out(out[..., :D])

    def decode_seq_tile(self, batch: int, n_kv_heads: int, head_dim: int,
                        kv_itemsize: int) -> int:
        """Sequences per decode grid step: amortizes the ~2-3us fixed
        per-step cost (DMA issue + semaphores + scalar index maps) over
        several sequences' KV streams.  8 streams/step measured fastest
        on v5e (89% of HBM peak with host-resolved row tables); larger
        groups lengthen the pipeline prologue, smaller ones expose the
        fixed cost -- pick the divisor of B nearest 8 that fits the
        double-buffered KV block buffers in the scoped-VMEM budget."""
        per_seq = (2 * 2 * self.dec_kv_tile * n_kv_heads * head_dim
                   * kv_itemsize)
        budget = 48 * 2**20
        divisors = [d for d in range(1, batch + 1) if batch % d == 0]
        for st in sorted(divisors, key=lambda d: (abs(d - 8), -d)):
            if st * per_seq <= budget:
                return st
        return 1
