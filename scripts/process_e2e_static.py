"""Summarize static-trace results into the reference's makespan table
and comparison figure.

ref: scripts/process_e2e_static.py:20-27 -- metric is makespan = max
request_e2e_time over the equal-length requests; report per
(model, ctx, P:D) with the vattn backends' speedup over the paged
baseline.  ``--plot out.png`` emits the grouped-bar comparison figure
the reference artifact produces (artifact_asplos25/helpers/
plot_figure_2.py role).

Accepts either the flat e2e_static.json rows or the long-context
collector's grid_results.json ({"configs": [...]}).

Usage: python scripts/process_e2e_static.py [results.json] [--plot out.png]
"""

import json
import sys
from collections import defaultdict

# fixed backend -> hue assignment (entity-stable; validated palette)
BACKEND_COLORS = {
    "fa_vattn_2mb": "#2a78d6",     # blue
    "fa_vattn_256kb": "#1baf7a",   # aqua
    "fa_paged_256": "#eb6834",     # orange
    "fa_paged_16": "#eda100",      # yellow
    "fa_pod": "#e87ba4",           # magenta
}
FALLBACK_COLORS = ["#008300", "#4a3aa7", "#8c8c84"]


def plot(grid, backends, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    keys = sorted(grid.keys())
    fig, ax = plt.subplots(figsize=(1.4 + 1.3 * len(keys), 3.6))
    width = 0.8 / max(len(backends), 1)
    import itertools

    extras = itertools.cycle(FALLBACK_COLORS)
    for i, b in enumerate(backends):
        xs, ys = [], []
        for k, key in enumerate(keys):
            if b in grid[key]:
                xs.append(k + (i - (len(backends) - 1) / 2) * width)
                ys.append(grid[key][b])
        base = b
        for suf in ("_fp8", "_int8", "_tuned", "_512q256", "_c4k"):
            base = base.replace(suf, "")
        color = BACKEND_COLORS.get(base, None) or next(extras)
        bars = ax.bar(xs, ys, width=width * 0.92, label=b, color=color,
                      edgecolor="white", linewidth=1)
        hatch = "//" if "fp8" in b else None
        for bar in bars:
            if hatch:
                bar.set_hatch(hatch)
    ax.set_xticks(range(len(keys)))
    ax.set_xticklabels(
        [f"{ctx//1024}K\nP:D {pd}" for (_, ctx, pd) in keys],
        fontsize=8, color="#40403e")
    ax.set_ylabel("makespan (s, lower is better)", fontsize=9,
                  color="#40403e")
    ax.legend(fontsize=8, frameon=False)
    ax.spines[["top", "right"]].set_visible(False)
    ax.tick_params(colors="#8c8c84")
    ax.yaxis.grid(True, color="#e8e8e4", linewidth=0.8)
    ax.set_axisbelow(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=160)
    print(f"wrote {out_path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plot_path = None
    if "--plot" in sys.argv:
        i = sys.argv.index("--plot")
        plot_path = (sys.argv[i + 1] if i + 1 < len(sys.argv)
                     else "benchmark_output/e2e_static_makespan.png")
        if plot_path in args:
            args.remove(plot_path)
    path = args[0] if args else "benchmark_output/e2e_static.json"
    with open(path) as f:
        rows = json.load(f)
    if isinstance(rows, dict):  # collector grid_results.json
        rows = rows["configs"]

    grid = defaultdict(dict)   # (model, ctx, pd) -> {backend: makespan}
    for r in rows:
        key = (r.get("model", "-"), r["ctx"], r["pd_ratio"])
        # wide-tile control cells keep their own column (the speedup
        # column then measures against the STRONGEST paged config)
        w = r.get("wide_tile")
        label = r["backend"] + (
            "" if not w else f"_{w}" if isinstance(w, str) else f"_w{w}")
        grid[key][label] = r["makespan_s"]

    backends = sorted({b for per in grid.values() for b in per})
    header = ["model", "ctx", "P:D"] + backends + ["best_vattn_speedup"]
    print("\t".join(header))
    for (model, ctx, pd), per_backend in sorted(grid.items()):
        paged = [v for b, v in per_backend.items()
                 if "paged" in b and "fp8" not in b]
        vattn = [v for b, v in per_backend.items()
                 if "vattn" in b and "fp8" not in b]
        speedup = (min(paged) / min(vattn)
                   if paged and vattn and min(vattn) > 0 else float("nan"))
        cells = [model, str(ctx), str(pd)]
        cells += [f"{per_backend.get(b, float('nan')):.2f}"
                  for b in backends]
        cells.append(f"{speedup:.3f}x")
        print("\t".join(cells))

    if plot_path:
        plot(grid, backends, plot_path)


if __name__ == "__main__":
    main()
