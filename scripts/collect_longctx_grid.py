"""Collect run_longctx_grid.sh results into one JSON artifact.

Parses the grid log (=== tag lines + the summary JSON tails) and the
per-config summary.json files under benchmark_output/longctx/, then
computes the vattn-vs-paged ratios the BASELINE north star is stated in
(>=1.1x tokens/s at 128K).

Usage: python scripts/collect_longctx_grid.py [--log /tmp/longctx_grid.log]
"""

import argparse
import json
import os
import re


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="benchmark_output/longctx")
    p.add_argument("--output",
                   default="benchmark_output/longctx/grid_results.json")
    args = p.parse_args()

    rows = []
    for tag in sorted(os.listdir(args.dir)):
        path = os.path.join(args.dir, tag, "summary.json")
        if not os.path.exists(path):
            continue
        m = re.match(r"(.+)_c(\d+)_pd(\d+)(?:_fair)?$", tag)
        if not m:
            continue
        with open(path) as f:
            s = json.load(f)
        rows.append({
            "backend": m.group(1), "ctx": int(m.group(2)),
            "pd_ratio": int(m.group(3)),
            "makespan_s": s["totals"]["makespan_s"],
            "tokens_per_s": s["totals"]["tokens_per_s"],
            "preemptions": s["totals"]["preemptions"],
        })

    ratios = []
    by_key = {(r["backend"], r["ctx"], r["pd_ratio"]): r for r in rows}
    for (backend, ctx, pd), r in sorted(by_key.items()):
        if backend == "fa_paged_256":
            continue
        paged = by_key.get(("fa_paged_256", ctx, pd))
        if paged:
            ratios.append({
                "backend": backend, "ctx": ctx, "pd_ratio": pd,
                "tokens_ratio_vs_paged":
                    round(r["tokens_per_s"] / paged["tokens_per_s"], 4),
                "makespan_ratio_paged_over_this":
                    round(paged["makespan_s"] / r["makespan_s"], 4),
            })
    out = {"configs": rows, "vs_paged": ratios}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    for r in ratios:
        print(r)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
