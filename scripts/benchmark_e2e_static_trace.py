"""Static-trace E2E benchmark driver.

ref: scripts/benchmark_e2e_static_trace.py:7-13 -- grid of {model} x
{backend} x {context length} x {P:D ratio}, 50 equal-length requests,
metric = makespan (max request_e2e_time, ref process_e2e_static.py:20-27).

Usage:
  python scripts/benchmark_e2e_static_trace.py --test          # smoke
  python scripts/benchmark_e2e_static_trace.py \
      --models yi-6b-200k --backends fa_vattn_2mb fa_paged_256 \
      --contexts 32768 65536 --pd-ratios 100
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--test", action="store_true")
    p.add_argument("--models", nargs="+", default=["yi-6b-200k"])
    p.add_argument("--backends", nargs="+",
                   default=["fa_vattn_2mb", "fa_paged_256"])
    p.add_argument("--contexts", nargs="+", type=int, default=[32768])
    p.add_argument("--pd-ratios", nargs="+", type=int,
                   default=[100])  # prefill:decode (ref 500/100/50)
    p.add_argument("--num-requests", type=int, default=50)
    p.add_argument("--max-batch-size", type=int, default=16)
    p.add_argument("--chunk-size", type=int, default=2048)
    p.add_argument("--output", default="benchmark_output/e2e_static.json")
    args = p.parse_args()

    from vattention_tpu.benchmark.main import add_args, run_from_args

    results = []
    for model in args.models:
        for backend in args.backends:
            for ctx in args.contexts:
                for pd in args.pd_ratios:
                    decode = max(1, ctx // (pd + 1))
                    prefill = ctx - decode
                    argv = [
                        "--model", model,
                        "--attention-backend", backend,
                        "--interval-generator", "static",
                        "--length-generator", "fixed",
                        "--num-requests", str(args.num_requests),
                        "--prefill-tokens", str(prefill),
                        "--decode-tokens", str(decode),
                        "--max-model-len", str(ctx + 128),
                        "--max-batch-size", str(args.max_batch_size),
                        "--max-num-seqs", str(args.max_batch_size),
                        "--chunk-size", str(args.chunk_size),
                    ]
                    if args.test:
                        argv += ["--test"]
                    bench_args = add_args(
                        argparse.ArgumentParser()).parse_args(argv)
                    summary = run_from_args(bench_args)
                    results.append({
                        "model": model, "backend": backend, "ctx": ctx,
                        "pd_ratio": pd,
                        "makespan_s": summary["totals"]["makespan_s"],
                        "tokens_per_s": summary["totals"]["tokens_per_s"],
                        "preemptions": summary["totals"]["preemptions"],
                    })
                    print(json.dumps(results[-1]))
                    if args.test:
                        break
                if args.test:
                    break
            if args.test:
                break
        if args.test:
            break
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
