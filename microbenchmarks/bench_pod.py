"""POD fused prefill+decode vs serial kernels on real TPU.

Reference claim (pod_attn/README.md): fusing prefill and decode
attention into one launch gives up to 61% / avg 33% lower attention
latency across hybrid-batch configs on A100.  This measures the TPU
analog: pod_fused_attention (one pallas call, decode KV DMAs hidden
under prefill MXU work) vs flash_prefill + flash_decode run serially.

Timing: chained-slope method (see bench_decode_kernel.py) -- dispatch
and fetch overheads cancel between N=2 and N=22 chains.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prefill", type=int, default=1024,
                   help="prefill chunk tokens")
    p.add_argument("--history", type=int, default=2048,
                   help="prefill kv history length (incl. chunk)")
    p.add_argument("--batch", type=int, default=16,
                   help="decode batch size")
    p.add_argument("--ctx", type=int, default=1024,
                   help="decode context length per seq")
    p.add_argument("--hq", type=int, default=32)
    p.add_argument("--hkv", type=int, default=4)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--layers", type=int, default=8,
                   help="chained calls per program")
    p.add_argument("--block-tokens", type=int, default=256)
    p.add_argument("--kv-tile", type=int, default=256)
    args = p.parse_args()

    from vattention_tpu.ops.flash_decode import flash_decode
    from vattention_tpu.ops.flash_prefill import flash_prefill
    from vattention_tpu.ops.pod_fused import (build_pod_schedule,
                                              pod_fused_attention)
    from vattention_tpu.ops.utils import (cdiv, round_up,
                                          tile_rows_from_segments)

    B, Hq, Hkv, D = args.batch, args.hq, args.hkv, args.head_dim
    L = args.layers
    S = 8
    q_tile, kv_tile = 128, args.kv_tile
    Tq = round_up(args.prefill, q_tile)
    ctx_pad = round_up(args.ctx, args.block_tokens)
    hist_pad = round_up(args.history, args.block_tokens)
    R = hist_pad + ctx_pad * B
    Lc = 2

    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((Lc, 2, Hkv, R, D)), jnp.bfloat16)
    qp = jnp.asarray(rng.standard_normal((Tq, Hq, D)), jnp.bfloat16)
    qd = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)

    # prefill seq: one extent at row 0; decode seqs packed after it
    pre_seg_row = np.zeros(S, np.int32)
    pre_seg_cum = np.zeros(S + 1, np.int32)
    pre_seg_cum[1:] = hist_pad
    q_start = args.history - args.prefill
    qinfo = np.array([q_start, args.history, 0], np.int32)

    dec_seg_row = np.zeros((B, S), np.int32)
    dec_seg_cum = np.zeros((B, S + 1), np.int32)
    for b in range(B):
        dec_seg_row[b, 0] = hist_pad + b * ctx_pad
        dec_seg_cum[b, 1:] = ctx_pad
    dec_seqlens = np.full(B, args.ctx, np.int32)

    qinfo2 = np.array([[q_start, args.history]], np.int32)
    sched = build_pod_schedule([Tq], q_tile, kv_tile, qinfo2,
                               dec_seqlens)
    j = {k: jnp.asarray(v) for k, v in dict(
        pre_seg_row=pre_seg_row, pre_seg_cum=pre_seg_cum, qinfo=qinfo,
        qinfo2=qinfo2, dec_seg_row=dec_seg_row, dec_seg_cum=dec_seg_cum,
        dec_seqlens=dec_seqlens, sched=sched).items()}

    max_kv_tiles_pre = cdiv(hist_pad, 512)
    max_kv_tiles_dec = cdiv(ctx_pad, 256)
    dec_tile_rows = jnp.asarray(tile_rows_from_segments(
        dec_seg_row, dec_seg_cum, 256, max_kv_tiles_dec))

    @jax.jit
    def serial(qp, qd, kv):
        for i in range(L):
            dinfo = jnp.full(1, i % Lc, jnp.int32)
            qi = j["qinfo"].at[2].set(i % Lc)
            op = flash_prefill(qp, kv, j["pre_seg_row"], j["pre_seg_cum"],
                               qi, q_tile=q_tile, kv_tile=512,
                               num_segments=S,
                               max_kv_tiles=max_kv_tiles_pre, kv_fetch=2)
            od = flash_decode(qd, kv, dec_tile_rows,
                              j["dec_seqlens"], dinfo, kv_tile=256,
                              max_kv_tiles=max_kv_tiles_dec,
                              seq_tile=8 if B % 8 == 0 else 1)
            qp, qd = op, od
        return qp, qd

    @jax.jit
    def fused(qp, qd, kv):
        for i in range(L):
            li = jnp.full(1, i % Lc, jnp.int32)
            op, od = pod_fused_attention(
                qp, qd, kv, j["sched"], j["pre_seg_row"][None],
                j["pre_seg_cum"][None], j["qinfo2"], li,
                j["dec_seg_row"], j["dec_seg_cum"],
                j["dec_seqlens"], q_tile=q_tile, kv_tile=kv_tile,
                num_segments=S)
            qp, qd = op, od
        return qp, qd

    def timed(fn, N):
        t0 = time.perf_counter()
        a, b = qp, qd
        for _ in range(N):
            a, b = fn(a, b, kv)
        _ = np.asarray(a), np.asarray(b)
        return time.perf_counter() - t0

    results = {}
    for name, fn in (("serial", serial), ("pod_fused", fused)):
        timed(fn, 1)
        t1 = min(timed(fn, 2) for _ in range(4))
        t2 = min(timed(fn, 22) for _ in range(4))
        per = (t2 - t1) / 20 / L
        results[name] = per
        print(f"{name:>10}: {per*1e6:8.1f} us/layer-call")
    speedup = results["serial"] / results["pod_fused"] - 1.0
    print(f"POD speedup over serial: {speedup*100:+.1f}%  "
          f"(prefill {args.prefill}@{args.history}, "
          f"decode B={args.batch}x{args.ctx})")


if __name__ == "__main__":
    main()
