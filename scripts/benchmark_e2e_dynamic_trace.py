"""Dynamic-trace E2E benchmark driver.

ref: scripts/benchmark_e2e_dynamic_trace.py:7-15 -- Poisson arrivals at
qps in {0.4, 0.8, 1, 2, 4, 6}, 256 requests (arxiv-summarization-style
lengths), metric = normalized request e2e p50/p90/p99
(ref process_e2e_dynamic.py:19-26).

Usage:
  python scripts/benchmark_e2e_dynamic_trace.py --test
  python scripts/benchmark_e2e_dynamic_trace.py \
      --model llama-3-8b --backends fa_vattn_2mb fa_paged_256 \
      --qps 0.4 1 2 [--trace-file arxiv.csv]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test", action="store_true")
    p.add_argument("--model", default="llama-3-8b")
    p.add_argument("--backends", nargs="+",
                   default=["fa_vattn_2mb", "fa_paged_256"])
    p.add_argument("--qps", nargs="+", type=float,
                   default=[0.4, 0.8, 1.0, 2.0, 4.0, 6.0])
    p.add_argument("--num-requests", type=int, default=256)
    p.add_argument("--trace-file", default=None,
                   help="CSV with num_prefill_tokens,num_decode_tokens")
    p.add_argument("--max-model-len", type=int, default=32768)
    p.add_argument("--min-tokens", type=int, default=4096)
    p.add_argument("--max-tokens", type=int, default=16384)
    p.add_argument("--max-batch-size", type=int, default=32)
    p.add_argument("--chunk-size", type=int, default=512)
    p.add_argument("--time-limit", type=float, default=None)
    p.add_argument("--output", default="benchmark_output/e2e_dynamic.json")
    args = p.parse_args()

    from vattention_tpu.benchmark.main import add_args, run_from_args

    results = []
    for backend in args.backends:
        for qps in args.qps:
            argv = [
                "--model", args.model,
                "--attention-backend", backend,
                "--interval-generator", "poisson",
                "--qps", str(qps),
                "--num-requests", str(args.num_requests),
                "--max-model-len", str(args.max_model_len),
                "--max-batch-size", str(args.max_batch_size),
                "--max-num-seqs", str(args.max_batch_size),
                "--chunk-size", str(args.chunk_size),
            ]
            if args.trace_file:
                argv += ["--length-generator", "trace",
                         "--trace-file", args.trace_file]
            else:
                # arxiv-summarization-like lengths without the file
                argv += ["--length-generator", "uniform",
                         "--min-tokens", str(args.min_tokens),
                         "--max-tokens", str(args.max_tokens)]
            if args.time_limit:
                argv += ["--time-limit", str(args.time_limit)]
            if args.test:
                argv += ["--test"]
            bench_args = add_args(argparse.ArgumentParser()).parse_args(argv)
            summary = run_from_args(bench_args)
            norm = summary["request_e2e_time_normalized"]
            results.append({
                "model": args.model, "backend": backend, "qps": qps,
                "normalized_e2e_p50": norm["p50"],
                "normalized_e2e_p90": norm["p90"],
                "normalized_e2e_p99": norm["p99"],
                "scheduling_delay_p50":
                    summary["scheduling_delay"]["p50"],
                "scheduling_delay_p99":
                    summary["scheduling_delay"]["p99"],
                "ttft_p50": summary["ttft"]["p50"],
                "ttft_p90": summary["ttft"]["p90"],
                "tokens_per_s": summary["totals"]["tokens_per_s"],
            })
            print(json.dumps(results[-1]))
            if args.test:
                break
        if args.test:
            break
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    # self-describing artifact (ADVICE r4: the exact invocation behind a
    # published sweep must be recoverable from the artifact itself)
    with open(args.output, "w") as f:
        json.dump({"meta": vars(args), "results": results}, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
