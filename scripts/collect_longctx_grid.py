"""Collect run_longctx_grid.sh results into one JSON artifact.

Globs every per-cell summary.json under benchmark_output/longctx/ and
computes the vattn-vs-paged ratios the BASELINE north star is stated in
(>=1.1x tokens/s at 128K), pairing cells within the same (ctx, P:D,
model).  Also emits the strongest-baseline decomposition table (wide
-tile control cells, tag suffix _w512/_w256) when those cells exist.

Tag grammar (see run_longctx_grid.sh run_cfg):
    {backend}[_fp8|_int8][_w512|_w256|_tuned][_m{model}]_c{ctx}_pd{pd}

Usage: python scripts/collect_longctx_grid.py [--dir DIR] [--output F]
"""

import argparse
import json
import os
import re


def parse_tag(tag):
    m = re.match(r"(.+)_c(\d+)_pd(\d+)(?:_fair)?$", tag)
    if not m:
        return None
    rest, ctx, pd = m.group(1), int(m.group(2)), int(m.group(3))
    model = "yi"
    wm = re.search(r"_m([a-z0-9-]+)$", rest)
    if wm:
        model, rest = wm.group(1), rest[: wm.start()]
    wide = None
    vm = re.search(r"_w(\d+)(q\d+)?$", rest)
    if vm:
        wide = (int(vm.group(1)) if not vm.group(2)
                else vm.group(0)[2:])  # e.g. "512q256"
        rest = rest[: vm.start()]
    elif rest.endswith("_tuned"):
        # tuned-tiling frontier cells (1024-wide kv + 256-row q tiles)
        wide, rest = "tuned", rest[: -len("_tuned")]
    return {"backend": rest, "ctx": ctx, "pd_ratio": pd,
            "model": model, "wide_tile": wide}


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
        parsed = parse_tag(tag)
        if not parsed:
            continue
        with open(path) as f:
            s = json.load(f)
        parsed.update({
            "tag": tag,
            "makespan_s": s["totals"]["makespan_s"],
            "tokens_per_s": s["totals"]["tokens_per_s"],
            "preemptions": s["totals"]["preemptions"],
        })
        # stall audit: time spent in steps far above the cell's own
        # steady state (compile stalls, host hiccups).  A makespan with
        # nonzero stall_s is not a pure steady-state number.
        bx = os.path.join(args.dir, tag, "batch_execution_time.csv")
        if os.path.exists(bx):
            with open(bx) as f:
                ts = [float(line.split(",")[1])
                      for line in f.readlines()[1:] if "," in line]
            if ts:
                srt = sorted(ts)
                med = srt[len(srt) // 2]
                cut = max(5 * med, 0.5)
                parsed["stall_s"] = round(
                    sum(t - cut for t in ts if t > cut), 2)
        rows.append(parsed)

    def key(r):
        # wide_tile is None | int | "tuned" -- stringify for stable sort
        return (r["backend"], r["ctx"], r["pd_ratio"], r["model"],
                str(r["wide_tile"]))

    by_key = {key(r): r for r in rows}

    # north-star ratios: each cell vs the plain fa_paged_256 twin AND
    # vs the strongest paged configuration present in the same
    # (ctx, pd, model) -- plain or wide-tile control, whichever is
    # faster (VERDICT r4 #1: the headline must beat the strongest
    # baseline, not a tile-capped one).
    ratios = []
    for r in sorted(rows, key=key):
        if r["backend"].startswith("fa_paged") or r["backend"].startswith(
                "fi_paged"):
            continue
        cand = [p for p in rows
                if p["backend"] == "fa_paged_256"
                and (p["ctx"], p["pd_ratio"], p["model"]) ==
                    (r["ctx"], r["pd_ratio"], r["model"])]
        if not cand:
            continue
        plain = next((p for p in cand if p["wide_tile"] is None), None)
        strongest = min(cand, key=lambda p: p["makespan_s"])
        entry = {
            "backend": r["backend"], "ctx": r["ctx"],
            "pd_ratio": r["pd_ratio"], "model": r["model"],
            "wide_tile": r["wide_tile"],
            "strongest_paged_tag": strongest["tag"],
            "tokens_ratio_vs_strongest_paged":
                round(r["tokens_per_s"] / strongest["tokens_per_s"], 4),
            "makespan_ratio_strongest_paged_over_this":
                round(strongest["makespan_s"] / r["makespan_s"], 4),
        }
        if plain is not None:
            entry["tokens_ratio_vs_paged"] = round(
                r["tokens_per_s"] / plain["tokens_per_s"], 4)
            entry["makespan_ratio_paged_over_this"] = round(
                plain["makespan_s"] / r["makespan_s"], 4)
        ratios.append(entry)

    # 4-way decomposition where the control cells exist:
    # (vattn x paged) x (512-wide x 256-wide) at fixed (ctx, pd, model)
    decomp = []
    for ctx, pd, model in sorted({(r["ctx"], r["pd_ratio"], r["model"])
                                  for r in rows}):
        cell = {}
        for nm, bk, wd in (
                ("vattn_512", "fa_vattn_2mb", None),
                ("vattn_256", "fa_vattn_2mb", 256),
                ("paged_512", "fa_paged_256", 512),
                ("paged_256", "fa_paged_256", None)):
            r = by_key.get((bk, ctx, pd, model, wd))
            if r:
                cell[nm] = r["makespan_s"]
        if len(cell) == 4:
            decomp.append({
                "ctx": ctx, "pd_ratio": pd, "model": model,
                "makespan_s": cell,
                "tile_width_effect_paged":
                    round(cell["paged_256"] / cell["paged_512"], 4),
                "tile_width_effect_vattn":
                    round(cell["vattn_256"] / cell["vattn_512"], 4),
                "contiguity_effect_at_512":
                    round(cell["paged_512"] / cell["vattn_512"], 4),
                "contiguity_effect_at_256":
                    round(cell["paged_256"] / cell["vattn_256"], 4),
                "vattn_vs_strongest_paged":
                    round(min(cell["paged_256"], cell["paged_512"])
                          / cell["vattn_512"], 4),
            })

    out = {"configs": rows, "vs_paged": ratios, "decomposition": decomp}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    for r in ratios:
        print(r)
    for d in decomp:
        print(d)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
