"""Kernel-level attention comparison sweep (paper Figure 2 analog).

ref: scripts/artifact_asplos25/helpers/run_figure_2.py:16-60 -- prefill
attention latency of FA vs FA_Paged vs FI vs FI_Paged across context
lengths 1K-32K.  The TPU analog compares the contiguous-arena (vattn)
Pallas kernels against the block-table (paged) Pallas kernels for both
phases, plus the fused POD kernel on a hybrid batch, and prints a CSV:

    phase,kernel,ctx,latency_ms,gbps

Usage: python scripts/artifact/run_kernel_sweep.py
       [--ctx 1024 2048 4096 8192 16384 32768] [--batch 16]
       [--csv out.csv] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def devtime(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, nargs="+",
                   default=[1024, 2048, 4096, 8192, 16384, 32768])
    p.add_argument("--batch", type=int, default=16,
                   help="decode batch size")
    p.add_argument("--kv-heads", type=int, default=4)
    p.add_argument("--q-heads", type=int, default=32)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--block-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--csv", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        # interpret_mode() turns on Pallas interpret off-TPU automatically
        jax.config.update("jax_platforms", "cpu")
        args.ctx = [c for c in args.ctx if c <= 2048]

    import jax.numpy as jnp
    import numpy as np

    from vattention_tpu.ops.flash_decode import flash_decode
    from vattention_tpu.ops.flash_prefill import flash_prefill
    from vattention_tpu.ops.paged_attention import (paged_flash_decode,
                                                    paged_flash_prefill)
    from vattention_tpu.ops.utils import (select_kv_tile,
                                          tile_rows_from_segments)

    Hq, Hkv, D = args.q_heads, args.kv_heads, args.head_dim
    BT = args.block_size
    B = args.batch
    S = 8
    max_ctx = max(args.ctx)
    R = max(max_ctx + BT, B * (max_ctx + BT))
    kv = jnp.zeros((1, 2, Hkv, R, D), jnp.bfloat16)
    kv_tile = select_kv_tile(BT)
    fetch = max(1, min(8, 512 // kv_tile))
    wide = kv_tile * fetch
    rows = []

    def emit(phase, kernel, ctx, dt, nbytes):
        rows.append((phase, kernel, ctx, dt * 1e3, nbytes / dt / 1e9))
        print(f"{phase},{kernel},{ctx},{dt*1e3:.3f},{nbytes/dt/1e9:.0f}")

    print("phase,kernel,ctx,latency_ms,gbps")
    for ctx in args.ctx:
        # ---------------- prefill: one seq, full-length chunk ----------- #
        Tq = min(ctx, 2048)
        q = jnp.ones((Tq, Hq, D), jnp.bfloat16)
        seg_row = jnp.zeros((S,), jnp.int32)
        seg_cum = jnp.asarray([0] + [ctx] * S, jnp.int32)
        qinfo = jnp.asarray([ctx - Tq, ctx, 0], jnp.int32)
        pre_bytes = ctx * Hkv * D * 2 * 2  # K+V read once (flash)

        dt = devtime(
            lambda q: flash_prefill(
                q, kv, seg_row, seg_cum, qinfo, q_tile=128, kv_tile=wide,
                num_segments=S, max_kv_tiles=max(1, ctx // wide),
                kv_fetch=fetch),
            q, iters=args.iters)
        emit("prefill", "vattn_contig", ctx, dt, pre_bytes)

        table = jnp.arange(ctx // BT, dtype=jnp.int32)
        dt = devtime(
            lambda q: paged_flash_prefill(
                q, kv, table, qinfo, q_tile=128, block_size=BT,
                max_kv_tiles=ctx // BT),
            q, iters=args.iters)
        emit("prefill", "paged", ctx, dt, pre_bytes)

        # ---------------- decode: B seqs at this context ---------------- #
        if B * (ctx + BT) > R:
            continue
        qd = jnp.ones((B, Hq, D), jnp.bfloat16)
        srow = np.zeros((B, S), np.int32)
        scum = np.zeros((B, S + 1), np.int32)
        for b in range(B):
            srow[b, 0] = b * (ctx + BT)
            scum[b, 1:] = ctx
        seqlens = jnp.full((B,), ctx, jnp.int32)
        dinfo = jnp.zeros((1,), jnp.int32)
        dec_bytes = B * ctx * Hkv * D * 2 * 2

        n_tiles = max(1, ctx // wide)
        tile_rows = jnp.asarray(tile_rows_from_segments(
            srow, scum, wide // fetch, n_tiles * fetch))
        seq_tile = 8 if B % 8 == 0 else 1
        dt = devtime(
            lambda q: flash_decode(
                q, kv, tile_rows, seqlens, dinfo, kv_tile=wide,
                max_kv_tiles=n_tiles, kv_fetch=fetch, seq_tile=seq_tile),
            qd, iters=args.iters)
        emit("decode", "vattn_contig", ctx, dt, dec_bytes)

        btab = np.zeros((B, ctx // BT), np.int32)
        for b in range(B):
            btab[b] = b * ((ctx + BT) // BT) + np.arange(ctx // BT)
        dt = devtime(
            lambda q: paged_flash_decode(
                q, kv, jnp.asarray(btab), seqlens, dinfo, block_size=BT,
                max_kv_tiles=ctx // BT),
            qd, iters=args.iters)
        emit("decode", "paged", ctx, dt, dec_bytes)

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("phase,kernel,ctx,latency_ms,gbps\n")
            for r in rows:
                f.write(f"{r[0]},{r[1]},{r[2]},{r[3]:.3f},{r[4]:.0f}\n")
        print(f"wrote {args.csv}", file=sys.stderr)


if __name__ == "__main__":
    main()
