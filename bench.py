"""Headline benchmark: serving throughput (tokens/s/chip) on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "roofline": N}

Workload: continuous-batching decode steady state on a Yi-6B-class model
(the reference benchmark grid's tp1 model, scripts/utils.py:27-32) -- B
concurrent requests, each with a prefilled context, decoding greedily.

Two backends run the SAME workload:
  - fa_vattn (contiguous-arena) -- ``value`` is its tokens/s/chip
  - fa_paged_256 (block-table)  -- the reference A/B baseline

``vs_baseline`` = vattn tokens/s / paged tokens/s: the north-star metric
(>= 1.1x target, BASELINE.md).  ``roofline`` = vattn tokens/s / the
HBM-bandwidth speed-of-light for the step (weights read once + each
request's KV read once); 1.0 means the decode step runs at memory speed.

Usage: python bench.py [--quick] [--model yi-6b-200k] [--batch 32]
       [--ctx 2048] [--steps 30] [--skip-paged]
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_comp_cache")
os.environ.setdefault(
    "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
import argparse
import json
import sys
import time


# v5e HBM bandwidth (bytes/s) for the roofline denominator
HBM_BW = 819e9


def measure(args, backend):
    """Steady-state decode throughput (tok/s) for one backend."""
    from vattention_tpu import LLMEngine, SamplingParams

    engine = LLMEngine.from_engine_args(
        model=args.model,
        load_format="zero",
        attention_backend=backend,
        scheduler_type="sarathi",
        chunk_size=512,
        max_model_len=args.max_model_len,
        max_batch_size=args.batch,
        max_num_seqs=args.batch,
        gpu_memory_utilization=0.9,
        kv_quant=args.kv_quant,
        # steady-state decode at one depth: the bucket pays its single
        # recompile during warmup and then trims the grid tail
        dynamic_kv_len_buckets=True,
    )

    for i in range(args.batch):
        engine.add_request(
            prompt=None,
            prompt_token_ids=[(7 * i + j) % 1000 + 1
                              for j in range(args.ctx)],
            sampling_params=SamplingParams(
                # large enough that nothing finishes during the run --
                # otherwise early requests complete while later prompts
                # prefill and the "steady state" silently shrinks
                temperature=0.0, max_tokens=100_000,
                ignore_eos=True),
            seq_id=f"b{i}")

    # run prefills until every request is decoding
    guard = 0
    while True:
        engine.step()
        sched = engine.scheduler
        if all(s.prompt_processing_finished for s in sched.running) \
                and not sched.waiting:
            break
        guard += 1
        assert guard < 10_000, (
            "requests stuck waiting: batch exceeds KV capacity at this "
            "context length -- lower --batch or --ctx")

    # timed decode steady state; count decode tokens actually scheduled
    # (not batch * steps -- beyond-capacity configs would overcount).
    # Median of several contiguous windows: one window of 20 steps is
    # ~0.4s and a single host/tunnel hiccup inside it once cost the
    # round a 9% phantom regression (BENCH_r03 1149.8 vs a reproducible
    # 1256.7) -- the median is immune to one bad window.
    store = engine.metrics_store
    for _ in range(5):
        engine.step()  # warm the decode-only signature
    rates = []
    for _ in range(args.windows):
        d0 = store.num_decode_tokens
        t0 = time.perf_counter()
        for _ in range(args.decode_steps):
            engine.step()
        dt = time.perf_counter() - t0
        rates.append(((store.num_decode_tokens - d0) / dt,
                      store.num_decode_tokens - d0))
    rates.sort()
    rate, n = rates[len(rates) // 2]
    engine.cleanup()
    from vattention_tpu.metrics.metrics_store import MetricsStore

    MetricsStore._instance = None
    del engine
    import gc

    gc.collect()
    return rate, n / args.decode_steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny CPU smoke run (sanity only)")
    p.add_argument("--model", default="yi-6b-200k")
    p.add_argument("--backend", default="fa_vattn_256kb")
    p.add_argument("--paged-backend", default="fa_paged_256")
    p.add_argument("--skip-paged", action="store_true",
                   help="roofline-only run (vs_baseline falls back to "
                        "the roofline ratio)")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--ctx", type=int, default=1024)
    p.add_argument("--decode-steps", type=int, default=20)
    p.add_argument("--windows", type=int, default=5,
                   help="timed windows; the median one is reported")
    p.add_argument("--max-model-len", type=int, default=2048)
    p.add_argument("--kv-quant", default="none",
                   help="KV cache dtype: none | fp8")
    args = p.parse_args()

    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.model = "tiny-llama-debug"
        args.batch, args.ctx, args.decode_steps = 2, 256, 3
        args.max_model_len = 1024

    from vattention_tpu.config import get_model_arch

    tokens_per_s, concurrency = measure(args, args.backend)

    # memory roofline for one decode step
    arch = get_model_arch(args.model)
    dtype_bytes = 2
    kv_dtype_bytes = 1 if args.kv_quant == "fp8" else dtype_bytes
    param_bytes = (arch.num_layers * (
        arch.hidden_size * (arch.num_q_heads + 2 * arch.num_kv_heads)
        * arch.head_dim
        + arch.num_q_heads * arch.head_dim * arch.hidden_size
        + 3 * arch.hidden_size * arch.intermediate_size)
        + 2 * arch.vocab_size * arch.hidden_size) * dtype_bytes
    kv_bytes = (concurrency * args.ctx * arch.num_kv_heads * arch.head_dim
                * 2 * arch.num_layers * kv_dtype_bytes)
    roofline_step = (param_bytes + kv_bytes) / HBM_BW
    roofline_tps = concurrency / roofline_step if roofline_step else 1.0
    roofline = tokens_per_s / roofline_tps if roofline_tps else 0.0

    if args.skip_paged:
        vs_baseline = roofline
        unit_ab = ""
    else:
        paged_tps, _ = measure(args, args.paged_backend)
        vs_baseline = tokens_per_s / paged_tps if paged_tps else 0.0
        unit_ab = f" vs {args.paged_backend} {paged_tps:.1f}"

    print(json.dumps({
        "metric": "decode_tokens_per_s_per_chip",
        "value": round(tokens_per_s, 1),
        "unit": f"tok/s ({args.model} B={args.batch} ctx={args.ctx} "
                f"{args.backend}"
                + (f" kv={args.kv_quant}" if args.kv_quant != "none"
                   else "") + unit_ab + ")",
        "vs_baseline": round(vs_baseline, 3),
        "roofline": round(roofline, 3),
    }))


if __name__ == "__main__":
    main()
