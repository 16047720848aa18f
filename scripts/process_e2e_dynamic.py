"""Summarize dynamic-trace results (normalized e2e percentiles vs QPS).

ref: scripts/process_e2e_dynamic.py:19-26 -- per backend and arrival
rate, report p50/p90/p99 of request e2e time normalized by output
length (the reference's headline dynamic metric).

Usage: python scripts/process_e2e_dynamic.py [benchmark_output/e2e_dynamic.json]
"""

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "benchmark_output/e2e_dynamic.json"
    with open(path) as f:
        rows = json.load(f)

    print("backend\tqps\tnorm_e2e_p50\tnorm_e2e_p90\tnorm_e2e_p99\t"
          "sched_delay_p99\ttok/s")
    for r in sorted(rows, key=lambda r: (r["backend"], r["qps"])):
        print(f"{r['backend']}\t{r['qps']}\t"
              f"{r['normalized_e2e_p50']:.4f}\t"
              f"{r['normalized_e2e_p90']:.4f}\t"
              f"{r['normalized_e2e_p99']:.4f}\t"
              f"{r['scheduling_delay_p99']:.3f}\t"
              f"{r['tokens_per_s']:.1f}")


if __name__ == "__main__":
    main()
