"""Sweep flash_decode tiling knobs on real TPU vs the KV-traffic roofline.

The serving profile shows decode attention is the step's only
off-roofline component; this isolates it.  Timing methodology: through
the remote-dispatch tunnel, ``block_until_ready`` does not wait for
device completion and a host fetch costs tens of ms, so neither can time
a kernel directly.  Instead we chain N data-dependent executions of an
L-call program, fetch once, and take the slope between small and large N
-- the per-program device time falls out, with dispatch/fetch overhead
cancelled.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

HBM_BW = 819e9  # v5e


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--hq", type=int, default=32)
    p.add_argument("--hkv", type=int, default=4)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--block-tokens", type=int, default=256)
    p.add_argument("--kv-dtype", default="bf16", help="bf16 | fp8")
    p.add_argument("--layers-alloc", type=int, default=2)
    args = p.parse_args()

    from vattention_tpu.ops.flash_decode import flash_decode
    from vattention_tpu.ops.utils import (fp8_packed_enabled,
                                          tile_rows_from_segments)

    B, Hq, Hkv, D = args.batch, args.hq, args.hkv, args.head_dim
    L = args.layers
    S = 8
    ctx = args.ctx
    ctx_pad = ((ctx + args.block_tokens - 1) // args.block_tokens
               ) * args.block_tokens
    R = ctx_pad * B
    Lc = args.layers_alloc  # cache layers allocated (keeps HBM modest)

    rng = np.random.default_rng(0)
    kv_dt = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8,
             "bf16": jnp.bfloat16}[args.kv_dtype]
    if args.kv_dtype == "int8":
        kv = jnp.asarray(rng.integers(-3, 3, (Lc, 2, Hkv, R, D)), kv_dt)
    else:
        kv = jnp.asarray(rng.standard_normal((Lc, 2, Hkv, R, D)), kv_dt)
    q = jnp.asarray(rng.standard_normal((B, Hq, D)), jnp.bfloat16)
    seg_row = np.zeros((B, S), np.int32)
    seg_cum = np.zeros((B, S + 1), np.int32)
    for b in range(B):
        seg_row[b, 0] = b * ctx_pad
        seg_cum[b, 1:] = ctx_pad
    seqlens = jnp.full(B, ctx, jnp.int32)
    dinfo = jnp.zeros(1, jnp.int32)

    kv_itemsize = 1 if args.kv_dtype in ("fp8", "int8") else 2
    kv_bytes = B * ctx * Hkv * D * 2 * kv_itemsize  # K+V
    print(f"KV traffic per call: {kv_bytes/1e6:.1f} MB; roofline per "
          f"{L} calls: {L*kv_bytes/HBM_BW*1e3:.2f} ms")

    def make(kv_tile, kv_fetch, seq_tile):
        n_tiles = -(-ctx_pad * 2 // kv_tile)
        tile_rows = jnp.asarray(tile_rows_from_segments(
            seg_row, seg_cum, kv_tile // kv_fetch, n_tiles * kv_fetch))

        @jax.jit
        def many(q, kv, tile_rows, seqlens, dinfo):
            outs = q
            for i in range(L):
                outs = flash_decode(
                    outs, kv, tile_rows, seqlens,
                    dinfo + (i % Lc),
                    kv_tile=kv_tile,
                    max_kv_tiles=n_tiles,
                    kv_fetch=kv_fetch, seq_tile=seq_tile,
                    fp8_packed=fp8_packed_enabled(kv.dtype))
            return outs
        return many, tile_rows

    def timed(many, tile_rows, N):
        t0 = time.perf_counter()
        out = q
        for _ in range(N):
            out = many(out, kv, tile_rows, seqlens, dinfo)
        _ = np.asarray(out)
        return time.perf_counter() - t0

    print(f"{'kv_tile':>8} {'fetch':>6} {'seq_tile':>8} "
          f"{'ms/L-calls':>11} {'GB/s':>8} {'%peak':>6}")
    sweep = [(256, 1, st) for st in (1, 4, 8, 12, 24)]
    sweep += [(512, 2, st) for st in (4, 8, 12, 24)]
    sweep += [(512, 1, 8), (1024, 4, 8), (1024, 2, 12)]
    for kv_tile, kv_fetch, seq_tile in sweep:
        if B % seq_tile or kv_tile % kv_fetch:
            continue
        if kv_tile // kv_fetch > args.block_tokens:
            continue  # sub-tile DMA must stay block-aligned
        try:
            many, tile_rows = make(kv_tile, kv_fetch, seq_tile)
            timed(many, tile_rows, 1)  # compile warm-up
            t1 = min(timed(many, tile_rows, 2) for _ in range(4))
            t2 = min(timed(many, tile_rows, 22) for _ in range(4))
            per = (t2 - t1) / 20
            bw = L * kv_bytes / per
            print(f"{kv_tile:>8} {kv_fetch:>6} {seq_tile:>8} "
                  f"{per*1e3:>11.2f} {bw/1e9:>8.0f} {bw/HBM_BW*100:>5.1f}%")
        except Exception as e:  # noqa: BLE001
            print(f"{kv_tile:>8} {kv_fetch:>6} {seq_tile:>8}   "
                  f"FAIL {type(e).__name__}: {str(e)[:80]}")


if __name__ == "__main__":
    main()
