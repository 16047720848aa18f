"""Headline benchmark: serving throughput (tokens/s/chip) on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "roofline": N}

Default mode (``--mode serving``) runs the reference's OWN headline
workload -- a long-context static trace (equal-length requests, P:D 100,
chunked prefill; scripts/benchmark_e2e_static_trace.py:7-13) -- on a
real-Yi-6B-per-layer-geometry model at 32K context, A/B against the
block-table paged baseline at its STRONGEST configuration
(PAGED_WIDE_TILE=512 + 256-row q tiles: 512-wide MXU tiles at 2
block DMAs -- its best measured tiling at 32K; 1024-wide regresses it
there -- vs the arena at ITS best, 2048-wide single-DMA tiles; see
docs/PERF.md decomposition and tuned-frontier tables).  This is the regime the BASELINE north star is stated
in (>= 1.1x tokens/s vs paged on long-context static traces).
``--mode decode`` keeps the earlier pure-decode steady-state microbench
(parity regime: both backends run the same decode kernel there).

Measurement: each backend self-warms (no compile stalls in the measured
span), and the A/B runs V-P-P-V interleaved because chip throughput
drifts +-8% in episodes of tens of minutes -- symmetric ordering
cancels linear drift.

``vs_baseline`` = vattn tokens/s / paged tokens/s.  ``roofline`` =
vattn tokens/s / a speed-of-light bound for the workload (serving: MXU
FLOPs bound; decode: HBM weights+KV traffic bound).

Usage: python bench.py [--quick] [--mode serving|decode] [--skip-paged]
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


def measure_serving(args, backend, env=None):
    """Static-trace serving throughput (tok/s) for one backend: the
    reference grid's workload (equal-length requests, P:D 100, chunked
    prefill), warmed, makespan-based.

    ``env`` overlays os.environ for the run (the wide-tile knobs are
    read at backend construction): the paged baseline runs with
    PAGED_WIDE_TILE=512 -- its STRONGEST configuration (512-wide MXU
    tiles at 2 block DMAs per tile) -- so vs_baseline is an A/B against
    the best block-table engine we can build, not a tile-width
    handicap (VERDICT r4 #1)."""
    from vattention_tpu.benchmark.benchmark_runner import BenchmarkRunner
    from vattention_tpu.metrics.metrics_store import MetricsStore

    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    MetricsStore._instance = None
    decode = max(args.serving_ctx // 101, 1)
    prefill = args.serving_ctx - decode
    runner = BenchmarkRunner(
        dict(model=args.serving_model, load_format="zero",
             attention_backend=backend, scheduler_type="sarathi",
             chunk_size=2048 if not args.quick else 128,
             max_model_len=args.serving_ctx + 128,
             max_batch_size=args.serving_batch,
             max_num_seqs=args.serving_batch,
             gpu_memory_utilization=0.93,
             write_metrics=True, output_dir="/tmp/bench_serving"),
        "synthetic",
        dict(num_requests=args.serving_requests,
             prefill_tokens=prefill, decode_tokens=decode,
             interval_generator="static", length_generator="fixed",
             seed=0),
        warmup=True)
    summary = runner.run()
    runner.engine.cleanup()
    MetricsStore._instance = None
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    import gc

    gc.collect()
    t = summary["totals"]
    t = dict(t, phase_stats=summary.get("phase_stats", {}))
    return t["processed_tokens"] / t["makespan_s"], t


def phase_rooflines(arch, t, kv_dtype_bytes=2):
    """Per-phase speed-of-light fractions from the run's phase stats
    (VERDICT r4 #3: one blended MXU number hides whether the gap is
    prefill inefficiency or unavoidable decode HBM traffic).

    prefill_mfu: MXU-bound fraction for steps containing prefill work
    (model matmul flops + causal attention flops over actual depths).
    decode_hbm: HBM-bound fraction for pure-decode steps (weights read
    once per step + KV read per token at its actual depth)."""
    ps = t.get("phase_stats") or {}
    if not ps.get("prefill_steps") and not ps.get("decode_steps"):
        return None, None
    MXU_PEAK = 197e12
    dtype_bytes = 2
    p_body = arch.num_layers * (
        arch.hidden_size * (arch.num_q_heads + 2 * arch.num_kv_heads)
        * arch.head_dim
        + arch.num_q_heads * arch.head_dim * arch.hidden_size
        + 3 * arch.hidden_size * arch.intermediate_size)
    param_bytes = (p_body + 2 * arch.vocab_size * arch.hidden_size) \
        * dtype_bytes
    prefill_mfu = None
    if ps.get("prefill_time_s", 0) > 0:
        # lm head excluded: it runs only over the B sampled positions
        # per step (models/llama.head), not every prefill token
        flops = (2 * ps["prefill_tokens"] * p_body
                 + 4 * ps["prefill_attn_weight"]
                 * arch.num_q_heads * arch.head_dim)
        prefill_mfu = (flops / MXU_PEAK) / ps["prefill_time_s"]
    decode_hbm = None
    if ps.get("decode_time_s", 0) > 0:
        kv_token_bytes = (2 * arch.num_kv_heads * arch.head_dim
                          * arch.num_layers * kv_dtype_bytes)
        traffic = (ps["decode_steps"] * param_bytes
                   + ps["decode_kv_tokens_decode_steps"]
                   * kv_token_bytes)
        decode_hbm = (traffic / HBM_BW) / ps["decode_time_s"]
    return prefill_mfu, decode_hbm


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny CPU smoke run (sanity only)")
    p.add_argument("--mode", default="serving",
                   choices=["serving", "decode"])
    p.add_argument("--model", default="yi-6b-200k")
    p.add_argument("--backend", default="fa_vattn_256kb")
    p.add_argument("--paged-backend", default="fa_paged_256")
    p.add_argument("--paged-wide-tile", type=int, default=512,
                   help="PAGED_WIDE_TILE for the serving A/B baseline: "
                        "512 = the paged engine's strongest tiling "
                        "(2 block DMAs per 512-wide MXU tile); 0 = "
                        "reference-default 256-wide tiling")
    p.add_argument("--vattn-wide-tile", type=int, default=2048,
                   help="VATTN_WIDE_TILE for the serving A/B vattn "
                        "side (2048 = measured-strongest arena tiling: "
                        "single-DMA 2048-wide kv tiles, the widest "
                        "VMEM allows; 0 = backend default 512)")
    p.add_argument("--q-tile", type=int, default=256,
                   help="VATTN_Q_TILE for BOTH serving A/B sides "
                        "(256 = measured-strongest for both engines "
                        "at 32K; 0 = default 128)")
    # serving-mode workload (the 32K cell of the long-context grid)
    p.add_argument("--serving-model", default="yi-6b-200k-l16")
    p.add_argument("--serving-ctx", type=int, default=32768)
    p.add_argument("--serving-batch", type=int, default=8)
    p.add_argument("--serving-requests", type=int, default=8)
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
        args.serving_model = "tiny-llama-debug"
        args.serving_ctx, args.serving_batch = 512, 2
        args.serving_requests = 2

    from vattention_tpu.config import get_model_arch

    if args.mode == "serving":
        backend = ("fa_vattn_2mb" if args.backend == "fa_vattn_256kb"
                   else args.backend)  # 2mb is the serving default
        arch = get_model_arch(args.serving_model)
        paged_env, vattn_env = {}, {}
        if args.paged_wide_tile:
            paged_env["PAGED_WIDE_TILE"] = str(args.paged_wide_tile)
        if args.vattn_wide_tile:
            vattn_env["VATTN_WIDE_TILE"] = str(args.vattn_wide_tile)
        if args.q_tile:
            paged_env["VATTN_Q_TILE"] = str(args.q_tile)
            vattn_env["VATTN_Q_TILE"] = str(args.q_tile)
        v1, t = measure_serving(args, backend, env=vattn_env)
        # MXU-FLOPs speed-of-light for the trace: matmul flops per
        # token + causal attention flops per request
        p_body = arch.num_layers * (
            arch.hidden_size * (arch.num_q_heads + 2 * arch.num_kv_heads)
            * arch.head_dim
            + arch.num_q_heads * arch.head_dim * arch.hidden_size
            + 3 * arch.hidden_size * arch.intermediate_size)
        attn_flops = (4 * (args.serving_ctx ** 2 / 2)
                      * arch.num_q_heads * arch.head_dim)
        total_flops = (2 * t["processed_tokens"] * p_body
                       + args.serving_requests * attn_flops)
        MXU_PEAK = 197e12  # v5e bf16
        lb_tps = (t["processed_tokens"] / (total_flops / MXU_PEAK)
                  if total_flops else 1.0)
        pre_mfu, dec_hbm = phase_rooflines(arch, t)
        phase_keys = {}
        if pre_mfu is not None:
            phase_keys["prefill_mfu"] = round(pre_mfu, 3)
        if dec_hbm is not None:
            phase_keys["decode_hbm_frac"] = round(dec_hbm, 3)
        if args.skip_paged:
            print(json.dumps({
                "metric": "serving_tokens_per_s_per_chip",
                "value": round(v1, 1),
                "unit": f"tok/s ({args.serving_model} static trace "
                        f"ctx={args.serving_ctx} P:D 100 "
                        f"n={args.serving_requests} B={args.serving_batch} "
                        f"{backend})",
                "vs_baseline": round(v1 / lb_tps, 3),
                "roofline": round(v1 / lb_tps, 3),
                **phase_keys,
            }))
            return
        p1, _ = measure_serving(args, args.paged_backend, env=paged_env)
        p2, _ = measure_serving(args, args.paged_backend, env=paged_env)
        v2, t2 = measure_serving(args, backend, env=vattn_env)

        pre2, dec2 = phase_rooflines(arch, t2)
        if pre_mfu is not None and pre2 is not None:
            phase_keys["prefill_mfu"] = round((pre_mfu + pre2) / 2, 3)
        if dec_hbm is not None and dec2 is not None:
            phase_keys["decode_hbm_frac"] = round(
                (dec_hbm + dec2) / 2, 3)
        value = (v1 + v2) / 2
        print(json.dumps({
            "metric": "serving_tokens_per_s_per_chip",
            "value": round(value, 1),
            "unit": f"tok/s ({args.serving_model} static trace "
                    f"ctx={args.serving_ctx} P:D 100 "
                    f"n={args.serving_requests} B={args.serving_batch} "
                    f"{backend} vs strongest-paged "
                    f"{args.paged_backend}"
                    + (f"+w{args.paged_wide_tile}"
                       if args.paged_wide_tile else "")
                    + f" {(p1 + p2) / 2:.1f})",
            "vs_baseline": round((v1 + v2) / max(p1 + p2, 1e-9), 3),
            "roofline": round(value / lb_tps, 3),
            **phase_keys,
        }))
        return

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

    if args.skip_paged:
        roofline = tokens_per_s / roofline_tps if roofline_tps else 0.0
        vs_baseline = roofline
        unit_ab = ""
    else:
        # V-P-P-V interleave: chip throughput drifts +-8% in episodes
        # of tens of minutes (measured 2026-08-21: 1066..1257 tok/s for
        # IDENTICAL code), so a single A-then-B comparison aliases the
        # drift into the ratio; symmetric ordering cancels linear drift
        paged_tps, _ = measure(args, args.paged_backend)
        paged2_tps, _ = measure(args, args.paged_backend)
        v2_tps, _ = measure(args, args.backend)
        vs_baseline = ((tokens_per_s + v2_tps)
                       / max(paged_tps + paged2_tps, 1e-9))
        tokens_per_s = (tokens_per_s + v2_tps) / 2
        roofline = tokens_per_s / roofline_tps if roofline_tps else 0.0
        unit_ab = (f" vs {args.paged_backend} "
                   f"{(paged_tps + paged2_tps) / 2:.1f}")

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
