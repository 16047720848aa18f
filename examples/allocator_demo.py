"""Standalone KV-arena allocator demo (ref: microbenchmarks/vattn_samples/vattn_demo_async.py).

Drives the allocator through a simulated dynamic serving workload:
requests arrive with random prompt lengths, decode for a while, finish.
Prints per-pass stats: step latency, relocation copies, fragmentation.

Usage: python examples/allocator_demo.py [--page-size-kb 64] [--steps 2000]
"""

import argparse
import time

import numpy as np

from vattention_tpu.config import KB, MB
from vattention_tpu.memory import VAttentionAllocator


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--page-size-kb", type=int, default=64)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--max-batch-size", type=int, default=32)
    p.add_argument("--memory-mb", type=int, default=256)
    p.add_argument("--max-context", type=int, default=8192)
    p.add_argument("--megacache", action="store_true")
    p.add_argument("--sync", action="store_true",
                   help="step_sync instead of step_async "
                        "(ref vattn_demo_sync.py vs vattn_demo_async.py)")
    args = p.parse_args()

    alloc = VAttentionAllocator()
    alloc.init_kvcache(
        num_layers=8, num_kv_heads=4, head_size=128,
        max_batch_size=args.max_batch_size,
        max_context_length=args.max_context,
        dtype_bytes=2, page_size=args.page_size_kb * KB,
        megacache=args.megacache)
    pages = alloc.reserve_physical_pages(args.memory_mb * MB)
    print(f"arena: {alloc.num_arena_blocks} KV blocks "
          f"({pages} pages of {args.page_size_kb}KB, "
          f"{alloc.block_tokens} tokens/block, "
          f"{alloc.arena_tokens} arena token rows)")

    rng = np.random.default_rng(0)
    active = {}
    step_times, relocs, admitted, finished = [], 0, 0, 0
    for it in range(args.steps):
        if len(active) < args.max_batch_size - 2 and rng.random() < 0.4:
            prompt = int(rng.integers(64, 2048))
            if alloc.tokens_to_blocks(prompt) < alloc.num_free_kvblocks():
                sid = alloc.alloc_new_batch_idx(prompt)
                if sid >= 0:
                    active[sid] = int(rng.integers(16, 256))
                    admitted += 1
        # scheduler-style backpressure: if the pool cannot hold one more
        # block per active request, preempt the newest request
        # (ref base_scheduler.py:135-143 can_append_slot/preempt loop)
        while (alloc.num_free_kvblocks() < len(active) and len(active) > 1):
            victim = list(active)[-1]
            alloc.free_batch_idx(victim)
            del active[victim]
        for sid in list(active):
            alloc.seq_lens[sid] += 1
            active[sid] -= 1
        t0 = time.perf_counter()
        step = alloc.step_sync if args.sync else alloc.step_async
        plan = step(alloc.seq_lens.copy())
        step_times.append(time.perf_counter() - t0)
        relocs += len(plan)
        for sid in [s for s, d in active.items() if d <= 0]:
            alloc.free_batch_idx(sid)
            del active[sid]
            finished += 1
        if (it + 1) % 500 == 0:
            mb_per_step = (relocs / (it + 1)) * alloc.kvblock_bytes / MB
            print(f"pass {it+1}: avg step {np.mean(step_times)*1e3:.3f} ms, "
                  f"p99 {np.percentile(step_times, 99)*1e3:.3f} ms, "
                  f"reloc copies: {relocs} ({mb_per_step:.2f} MB/step), "
                  f"active: {len(active)}, "
                  f"free kvblocks: {alloc.num_free_kvblocks()}, "
                  f"fragmentation: {alloc.fragmentation_overhead()*100:.2f}%")
            step_times = []

    print(f"done: admitted {admitted}, finished {finished}, "
          f"total relocation copies {relocs}")
    alloc.cleanup()
    print("cleaned up.")


if __name__ == "__main__":
    main()
