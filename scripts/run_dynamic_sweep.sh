#!/bin/bash
# Dynamic Poisson-trace qps sweep (the PERF.md "Dynamic trace" table).
#
# Exact published invocation (ADVICE r4: the flags behind the artifact
# must be recorded): yi-6b-200k-l16, 32 Poisson arrivals/cell, uniform
# 2K-8K total tokens (P:D 8 arxiv-summarization shape), qps {0.8,2,6},
# backends {fa_vattn_2mb, fa_paged_256, fa_pod}.  The artifact is
# self-describing (meta block with these args).
#
# Must run EXCLUSIVELY on the chip (see run_longctx_grid.sh header).
set -eu
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
OUT=${1:-benchmark_output/e2e_dynamic.json}
python scripts/benchmark_e2e_dynamic_trace.py \
  --model yi-6b-200k-l16 \
  --backends fa_vattn_2mb fa_paged_256 fa_pod \
  --qps 0.8 2 6 \
  --num-requests 32 \
  --min-tokens 2048 --max-tokens 8192 \
  --max-model-len 16384 \
  --max-batch-size 16 \
  --chunk-size 512 \
  --output "$OUT"
echo "sweep done -> $OUT"
