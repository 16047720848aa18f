"""StepInputs: the fixed-shape pytree handed to the jitted serving step.

TPU-first design note: everything under jit is traced once per
(n_prefill_tokens, B) signature, so the whole per-iteration state --
flattened tokens, extent tables, sampling params -- is carried in arrays
of static shape.  The token layout mirrors the reference's batch-ordering
contract (prefills before decodes, model_runner.py:79-106):

    [0, n_prefill_tokens)            up to K sequences' prompt chunks,
                                     each padded to the q tile (run k at
                                     [pre_off[k], pre_off[k]+chunk_k))
    [n_prefill_tokens, n_pre + B)    one decode token per batch SLOT
                                     (slot b at index n_pre + b)

Decode tokens are slot-indexed (the allocator's batch indices), which is
what lets the decode kernel consume per-slot extent tables directly --
the TPU generalization of the reference's ``cache_batch_idx``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class StepInputs(NamedTuple):
    token_ids: jax.Array       # [T] int32
    positions: jax.Array       # [T] int32
    append_rows: jax.Array     # [T] int32 arena row per token (-1 = skip)
    # prefill metadata, one row per prefill RUN (K runs per step;
    # unused rows zeroed).  For the paged backend pre_seg_row holds the
    # per-run block tables instead of extent rows.
    pre_seg_row: jax.Array     # [K, S] int32
    pre_seg_cum: jax.Array     # [K, S+1] int32
    pre_qinfo: jax.Array       # [K, 2] int32 (q_start, kv_len)
    # decode metadata (slot-indexed)
    dec_seg_row: jax.Array     # [B, S] int32
    dec_seg_cum: jax.Array     # [B, S+1] int32
    dec_seqlens: jax.Array     # [B] int32 (0 = not decoding this step)
    # sampling
    sample_idx: jax.Array      # [B] int32 index into [T] (-1 = invalid)
    temperatures: jax.Array    # [B] float32
    top_p: jax.Array           # [B] float32
    top_k: jax.Array           # [B] int32
    rng: jax.Array             # PRNG key
    # POD fused-kernel schedule (host-built tile weave), None unless the
    # FA_POD backend is active and the step mixes prefill + decode
    pod_sched: jax.Array = None
    # prefill chunk as contiguous arena runs [S, 3] (dst_row0, src_tok0,
    # n) for the run-append kernel; None on decode-only steps
    pre_runs: jax.Array = None
    # async execution: slots whose input token is the previous step's
    # device-sampled token (host only has a placeholder) -- the step
    # splices it in from the persistent device token buffer, so the
    # decode critical path never waits on a device->host round trip
    use_prev_tok: jax.Array = None  # [B] bool
    # per-q-tile run table for multi-prefill steps: qt_run[qt] =
    # (run index, local q-tile index within the run); None on
    # decode-only steps
    qt_run: jax.Array = None   # [n_pre//q_tile, 2] int32
    # host-resolved arena row of each prefill-run KV sub-tile start
    # (one scalar read per index-map call instead of a segment walk)
    pre_tile_rows: jax.Array = None  # [K, n_sub] int32
    # host-resolved arena row of each decode KV sub-tile start
    # (ops/utils.tile_rows_from_segments); spares the decode kernel's
    # index_maps an unrolled segment walk per (seq, tile).  None falls
    # back to an in-program construction from the segment tables.
    dec_tile_rows: jax.Array = None  # [B, n_sub] int32
