#!/bin/bash
# Archive the long-context grid into the tracked tree (data/results_r5).
#
# benchmark_output/ is gitignored (per-cell CSVs are hundreds of MB at
# depth); what the judge/driver needs committed is, per cell: the
# summary.json the ratios recompute from, the run log, and the
# aggregate grid_results.json + figures.  Full CSVs stay in the
# (untracked) benchmark_output/longctx directories on this machine.
set -eu
cd "$(dirname "$0")/.."
SRC=benchmark_output/longctx
DST=${1:-data/results_r5/longctx}
mkdir -p "$DST"
python scripts/collect_longctx_grid.py
for d in "$SRC"/*/; do
  cell=$(basename "$d")
  [ -f "$d/summary.json" ] || continue
  mkdir -p "$DST/$cell"
  cp "$d/summary.json" "$DST/$cell/"
done
cp "$SRC"/*.log "$DST/" 2>/dev/null || true
cp "$SRC/grid_results.json" "$DST/../grid_results.json"
python scripts/process_e2e_static.py "$SRC/grid_results.json" \
  --plot "$SRC/makespan_grid.png" || true
cp "$SRC"/*.png "$DST/../" 2>/dev/null || true
echo "archived $(ls -d "$DST"/*/ | wc -l) cells -> $DST"
