"""Summarize dynamic-trace results (normalized e2e percentiles vs QPS).

ref: scripts/process_e2e_dynamic.py:19-26 -- per backend and arrival
rate, report p50/p90/p99 of request e2e time normalized by output
length (the reference's headline dynamic metric).  ``--plot out.png``
emits the percentile-vs-QPS line figure the reference artifact
produces.

Usage: python scripts/process_e2e_dynamic.py [results.json] [--plot out.png]
"""

import json
import sys

from process_e2e_static import BACKEND_COLORS, FALLBACK_COLORS


def plot(rows, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    backends = sorted({r["backend"] for r in rows})
    fig, axes = plt.subplots(1, 2, figsize=(8.4, 3.4), sharex=True)
    extras = iter(FALLBACK_COLORS)
    colors = {b: BACKEND_COLORS.get(b.replace("_fp8", ""))
              or next(extras) for b in backends}
    for ax, pct, title in ((axes[0], "normalized_e2e_p50", "p50"),
                           (axes[1], "normalized_e2e_p99", "p99")):
        for b in backends:
            pts = sorted(((r["qps"], r[pct]) for r in rows
                          if r["backend"] == b))
            ax.plot([p[0] for p in pts], [p[1] for p in pts],
                    marker="o", markersize=4, linewidth=2,
                    label=b, color=colors[b])
        ax.set_title(f"normalized e2e {title} (s/token, lower is "
                     "better)", fontsize=9, color="#40403e")
        ax.set_xlabel("arrival rate (qps)", fontsize=9, color="#40403e")
        ax.spines[["top", "right"]].set_visible(False)
        ax.tick_params(colors="#8c8c84", labelsize=8)
        ax.yaxis.grid(True, color="#e8e8e4", linewidth=0.8)
        ax.set_axisbelow(True)
    axes[0].legend(fontsize=8, frameon=False)
    fig.tight_layout()
    fig.savefig(out_path, dpi=160)
    print(f"wrote {out_path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plot_path = None
    if "--plot" in sys.argv:
        i = sys.argv.index("--plot")
        plot_path = (sys.argv[i + 1] if i + 1 < len(sys.argv)
                     else "benchmark_output/e2e_dynamic_percentiles.png")
        if plot_path in args:
            args.remove(plot_path)
    path = args[0] if args else "benchmark_output/e2e_dynamic.json"
    with open(path) as f:
        rows = json.load(f)
    if isinstance(rows, dict):  # self-describing artifact (meta+results)
        if rows.get("meta"):
            print("# invocation:", json.dumps(rows["meta"]))
        rows = rows["results"]

    print("backend\tqps\tnorm_e2e_p50\tnorm_e2e_p90\tnorm_e2e_p99\t"
          "sched_delay_p99\ttok/s")
    for r in sorted(rows, key=lambda r: (r["backend"], r["qps"])):
        print(f"{r['backend']}\t{r['qps']}\t"
              f"{r['normalized_e2e_p50']:.4f}\t"
              f"{r['normalized_e2e_p90']:.4f}\t"
              f"{r['normalized_e2e_p99']:.4f}\t"
              f"{r['scheduling_delay_p99']:.3f}\t"
              f"{r['tokens_per_s']:.1f}")
    if plot_path:
        plot(rows, out_path=plot_path)


if __name__ == "__main__":
    main()
