"""Probe: POD fused kernel correctness at a given prefill KV depth.

Round-4 VERDICT #2: POD_KV_LEN_LIMIT=8192 fences the fused kernel out
of the long-context regime; >=16K tripped a Mosaic fault attributed to
the prefill KV stream's BlockSpec pipeline (the decode stream's analog
fault was fixed with manual double-buffered DMAs).  This probe runs one
fused call at --depth and compares against the serial kernels, so the
fault boundary can be bisected per kernel revision in a throwaway
process (a Mosaic abort kills the process, not the session).

Usage: timeout 300 python scripts/probe_pod_depth.py --depth 16384
Exit 0 = correct, nonzero = fault/mismatch.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=16384,
                   help="prefill kv history length (incl. chunk)")
    p.add_argument("--prefill", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--kv-tile", type=int, default=256)
    p.add_argument("--hq", type=int, default=32)
    p.add_argument("--hkv", type=int, default=4)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--n-prefill", type=int, default=1,
                   help="number of fused prefill runs (multi-prefill)")
    args = p.parse_args()

    from vattention_tpu.ops.flash_decode import flash_decode
    from vattention_tpu.ops.flash_prefill import flash_prefill
    from vattention_tpu.ops.pod_fused import (build_pod_schedule,
                                              pod_fused_attention)
    from vattention_tpu.ops.utils import (cdiv, round_up,
                                          tile_rows_from_segments)

    B, Hq, Hkv, D = args.batch, args.hq, args.hkv, args.head_dim
    S = 8
    q_tile, kv_tile = 128, args.kv_tile
    ctx_pad = round_up(args.ctx, 256)
    hist_pad = round_up(args.depth, 256)

    # runs: run 0 at --depth; further runs at 4096-depth histories
    # stacked after the decode area (multi-prefill fusion)
    K = args.n_prefill
    chunks = [args.prefill] + [384] * (K - 1)
    depths = [args.depth] + [4096] * (K - 1)
    hist_pads = [round_up(d, 256) for d in depths]
    R = hist_pad + ctx_pad * B + sum(hist_pads[1:])

    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((1, 2, Hkv, R, D)), jnp.bfloat16)
    qd = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)

    pre_seg_row = np.zeros((K, S), np.int32)
    pre_seg_cum = np.zeros((K, S + 1), np.int32)
    qinfo = np.zeros((K, 2), np.int32)
    q_parts, offs = [], []
    row0 = [0] + list(hist_pad + ctx_pad * B
                      + np.cumsum([0] + hist_pads[1:-1]).astype(int))
    off = 0
    for r in range(K):
        pre_seg_row[r, 0] = row0[r]
        pre_seg_cum[r, 1:] = hist_pads[r]
        qinfo[r] = (depths[r] - chunks[r], depths[r])
        pad = round_up(chunks[r], q_tile)
        q_parts.append(rng.standard_normal((pad, Hq, D)))
        offs.append(off)
        off += pad
    qp = jnp.asarray(np.concatenate(q_parts), jnp.bfloat16)

    dec_seg_row = np.zeros((B, S), np.int32)
    dec_seg_cum = np.zeros((B, S + 1), np.int32)
    for b in range(B):
        dec_seg_row[b, 0] = hist_pad + b * ctx_pad
        dec_seg_cum[b, 1:] = ctx_pad
    dec_seqlens = np.full(B, args.ctx, np.int32)

    sched = build_pod_schedule(chunks, q_tile, kv_tile, qinfo,
                               dec_seqlens)
    n_pre = int((sched[:, 0] == 0).sum())
    n_dec = int((sched[:, 0] == 1).sum())
    print(f"depth={args.depth} K={K} sched={sched.shape[0]} "
          f"(pre {n_pre} dec {n_dec})", flush=True)

    op, od = pod_fused_attention(
        qp, qd, kv, jnp.asarray(sched), jnp.asarray(pre_seg_row),
        jnp.asarray(pre_seg_cum), jnp.asarray(qinfo),
        jnp.zeros(1, jnp.int32),
        jnp.asarray(dec_seg_row), jnp.asarray(dec_seg_cum),
        jnp.asarray(dec_seqlens), q_tile=q_tile, kv_tile=kv_tile,
        num_segments=S)
    op, od = np.asarray(op, np.float32), np.asarray(od, np.float32)
    print("fused done", flush=True)

    max_kv_tiles_dec = cdiv(ctx_pad, 256)
    dec_tile_rows = jnp.asarray(tile_rows_from_segments(
        dec_seg_row, dec_seg_cum, 256, max_kv_tiles_dec))
    err_p = 0.0
    for r in range(K):
        qinfo3 = np.array([qinfo[r, 0], qinfo[r, 1], 0], np.int32)
        pad = round_up(chunks[r], q_tile)
        ref_p = np.asarray(flash_prefill(
            qp[offs[r]:offs[r] + pad], kv,
            jnp.asarray(pre_seg_row[r]), jnp.asarray(pre_seg_cum[r]),
            jnp.asarray(qinfo3), q_tile=q_tile, kv_tile=kv_tile,
            num_segments=S, max_kv_tiles=cdiv(hist_pads[r], kv_tile)),
            np.float32)
        err_p = max(err_p, float(np.max(np.abs(
            op[offs[r]:offs[r] + chunks[r]]
            - ref_p[:chunks[r]]))))
    ref_d = np.asarray(flash_decode(
        qd, kv, dec_tile_rows, jnp.asarray(dec_seqlens),
        jnp.zeros(1, jnp.int32), kv_tile=256,
        max_kv_tiles=max_kv_tiles_dec,
        seq_tile=8 if B % 8 == 0 else 1), np.float32)

    err_d = np.max(np.abs(od - ref_d))
    print(f"max|err| prefill={err_p:.4f} decode={err_d:.4f}")
    ok = err_p < 3e-2 and err_d < 3e-2
    print("OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
