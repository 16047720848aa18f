"""Summarize static-trace results into the reference's makespan table.

ref: scripts/process_e2e_static.py:20-27 -- metric is makespan = max
request_e2e_time over the 50 equal-length requests; report per
(model, ctx, P:D) with the vattn backends' speedup over the paged
baseline.

Usage: python scripts/process_e2e_static.py [benchmark_output/e2e_static.json]
"""

import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "benchmark_output/e2e_static.json"
    with open(path) as f:
        rows = json.load(f)

    grid = defaultdict(dict)   # (model, ctx, pd) -> {backend: makespan}
    for r in rows:
        grid[(r["model"], r["ctx"], r["pd_ratio"])][r["backend"]] = \
            r["makespan_s"]

    backends = sorted({r["backend"] for r in rows})
    header = ["model", "ctx", "P:D"] + backends + ["best_vattn_speedup"]
    print("\t".join(header))
    for (model, ctx, pd), per_backend in sorted(grid.items()):
        paged = [v for b, v in per_backend.items() if "paged" in b]
        vattn = [v for b, v in per_backend.items() if "vattn" in b]
        speedup = (min(paged) / min(vattn)
                   if paged and vattn and min(vattn) > 0 else float("nan"))
        cells = [model, str(ctx), str(pd)]
        cells += [f"{per_backend.get(b, float('nan')):.2f}"
                  for b in backends]
        cells.append(f"{speedup:.3f}x")
        print("\t".join(cells))


if __name__ == "__main__":
    main()
