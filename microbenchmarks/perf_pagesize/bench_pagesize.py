"""Page-size sensitivity of attention kernel latency.

ref: microbenchmarks/perf_pagesize/bench_pagesize.py:15-30 -- prefill and
decode attention latency at 64KB vs 2MB pages.  On the TPU arena the page
size sets block_tokens (extent alignment), which sets the per-DMA
sub-tile width (kv_fetch); the point of the measurement is that latency
stays flat across page sizes -- the vattention claim that small pages do
not slow the attention kernel down, unlike small-block PagedAttention.

Usage: python microbenchmarks/perf_pagesize/bench_pagesize.py
       [--ctx 8192] [--chunk 2048] [--batch 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, default=8192)
    p.add_argument("--chunk", type=int, default=2048)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--kv-heads", type=int, default=4)
    p.add_argument("--q-heads", type=int, default=32)
    p.add_argument("--head-dim", type=int, default=128)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vattention_tpu.model_executor.attention.vattn_backend import (
        VattnAttentionBackend,
    )
    from vattention_tpu.model_executor.step_inputs import StepInputs
    from vattention_tpu.ops.flash_decode import flash_decode
    from vattention_tpu.ops.flash_prefill import flash_prefill
    from vattention_tpu.ops.utils import tile_rows_from_segments

    KB, MB = 1024, 1024 * 1024
    Hkv, Hq, D = args.kv_heads, args.q_heads, args.head_dim

    def block_tokens(page_size):
        # allocator math: one page holds K or V rows of all kv heads for
        # block_tokens positions of one layer (memory/allocator.py)
        return max(1, page_size // (Hkv * D * 2))

    R = 36864
    kv = jnp.zeros((1, 2, Hkv, R, D), jnp.bfloat16)
    S, N = 8, args.iters

    def devtime(f, x):
        def body(q, _):
            return f(q), None
        g = jax.jit(lambda x: jax.lax.fori_loop(
            0, 8, lambda i, q: jax.lax.scan(body, q, None, length=N)[0],
            x))
        jax.block_until_ready(g(x))
        t0 = time.perf_counter()
        jax.block_until_ready(g(x))
        return ((time.perf_counter() - t0) / 8 - 540e-6) / N

    print("page_size\tblock_tokens\tprefill_ms\tdecode_ms")
    for page in (64 * KB, 256 * KB, 2 * MB):
        bt = block_tokens(page)
        backend = VattnAttentionBackend(
            block_tokens=bt, num_segments=S, max_context_len=args.ctx,
            arena_rows=R, scratch_row=R)
        # prefill: chunk attending full ctx (single extent per block run)
        q = jnp.zeros((args.chunk, Hq, D), jnp.bfloat16)
        seg_row = jnp.zeros(S, jnp.int32)
        seg_cum = jnp.asarray([0] + [args.ctx] * S, jnp.int32)
        qinfo = jnp.asarray([args.ctx - args.chunk, args.ctx, 0], jnp.int32)
        tp = devtime(lambda q: flash_prefill(
            q, kv, seg_row, seg_cum, qinfo,
            kv_tile=backend.wide_kv_tile, kv_fetch=backend.wide_kv_fetch,
            num_segments=S,
            max_kv_tiles=-(-args.ctx // backend.wide_kv_tile)), q)
        # decode: batch of ctx-long sequences
        B = args.batch
        qd = jnp.zeros((B, Hq, D), jnp.bfloat16)
        rows_per_seq = -(-args.ctx // bt) * bt + bt
        sr = np.zeros((B, S), np.int32)
        for b in range(B):
            sr[b, 0] = (b * rows_per_seq) % (R - rows_per_seq)
        sc = np.zeros((B, S + 1), np.int32)
        sc[:, 1:] = -(-args.ctx // bt) * bt
        n_tiles = -(-args.ctx // backend.wide_kv_tile)
        tile_rows = jnp.asarray(tile_rows_from_segments(
            sr, sc, backend.wide_kv_tile // backend.wide_kv_fetch,
            n_tiles * backend.wide_kv_fetch))
        td = devtime(lambda q: flash_decode(
            q, kv, tile_rows,
            jnp.full(B, args.ctx, jnp.int32), jnp.asarray([0], jnp.int32),
            kv_tile=backend.wide_kv_tile, kv_fetch=backend.wide_kv_fetch,
            max_kv_tiles=n_tiles,
            seq_tile=8 if B % 8 == 0 else 1), qd)
        label = f"{page // KB}KB" if page < MB else f"{page // MB}MB"
        print(f"{label}\t{bt}\t{tp * 1e3:.3f}\t{td * 1e3:.3f}")


if __name__ == "__main__":
    main()
