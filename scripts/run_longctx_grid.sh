#!/bin/bash
# Long-context static-trace A/B grid on one TPU chip.
#
# ref grid: scripts/benchmark_e2e_static_trace.py:7-13 -- ctx {32K, 64K,
# 128K} x P:D {500,100,50} x backends {fa_vattn_2mb, fa_vattn_256kb,
# fa_paged_256, fi_paged_16 analog}, makespan metric
# (process_e2e_static.py:20-27).
#
# Model: yi-6b-200k-l16 (real Yi-6B per-layer geometry, half depth so
# 128K KV + bf16 weights fit 16GiB -- the reference ran 80GB A100s).
# KV dtype: bf16 (the reference grid does not quantize KV); the fp8
# pair is run as an explicit extra dimension -- BOTH engines quantize
# (round-3's grid left the paged pool silently bf16, docs/PERF.md).
# Request counts scaled to chip-hour budget; batch per ctx.
#
# IMPORTANT: cells must run EXCLUSIVELY -- a concurrent CPU-heavy
# process (even a pytest run) starves XLA/Mosaic compilation and
# poisons the makespan by minutes.  Each cell self-warms (the harness
# warmup request compiles BOTH serving signatures now that the prefill
# region is fixed-width), so makespans contain no compile stalls and
# warm/cold cache state cannot skew a cell.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
MODEL=yi-6b-200k-l16
OUT=benchmark_output/longctx
mkdir -p "$OUT"

run_cfg () {
  local ctx=$1 backend=$2 pd=$3 batch=$4 nreq=$5 kvq=${6:-none}
  local decode=$(( ctx / (pd + 1) )); [ $decode -lt 1 ] && decode=1
  local prefill=$(( ctx - decode ))
  local tag="${backend}_c${ctx}_pd${pd}"
  local kvflag=""
  if [ "$kvq" != "none" ]; then
    tag="${backend}_${kvq}_c${ctx}_pd${pd}"
    kvflag="--kv-quant $kvq"
  fi
  echo "=== $tag (B=$batch n=$nreq) ==="
  for attempt in 1 2; do
    timeout 2400 python -m vattention_tpu.benchmark.main \
      --model $MODEL --load-format zero $kvflag \
      --attention-backend $backend --scheduler-type sarathi \
      --chunk-size 2048 --max-model-len $(( ctx + 128 )) \
      --max-batch-size $batch --max-num-seqs $batch \
      --gpu-memory-utilization 0.93 \
      --interval-generator static --length-generator fixed \
      --num-requests $nreq --prefill-tokens $prefill \
      --decode-tokens $decode \
      --output-dir "$OUT/$tag" > "$OUT/$tag.log" 2>&1 && break
    # transient RESOURCE_EXHAUSTED: the previous cell's HBM frees
    # lazily server-side; wait and retry once
    echo "  attempt $attempt failed (see $OUT/$tag.log); retrying"
    sleep 30
  done
  tail -6 "$OUT/$tag.log"
  sleep 5  # let the server reclaim this cell's HBM
}

# Cells run in value order so a truncated chip-hour budget still yields
# the north-star evidence first.  TIER=pairs runs only the ctx-sweep
# vattn-vs-paged pairs; TIER=headline adds the 32K extras (256kb page
# size, small-block paged) and the P:D sweep; TIER=full adds the
# 64K/128K 256kb cells and the fp8 pair.
TIER=${TIER:-full}

# 1. ctx sweep at P:D 100, the north-star A/B pair per ctx
# (TIER=extras skips these, for resuming a budget-truncated grid)
if [ "$TIER" != "extras" ]; then
  for ctx_b_n in "32768 8 8" "65536 4 6" "131072 2 4"; do
    set -- $ctx_b_n
    for backend in fa_vattn_2mb fa_paged_256; do
      run_cfg $1 $backend 100 $2 $3
    done
  done
fi
if [ "$TIER" != "pairs" ]; then
  # 2. page-size + small-block-paged dimension at 32K
  run_cfg 32768 fa_vattn_256kb 100 8 8
  run_cfg 32768 fa_paged_16 100 8 8
  # 3. P:D ratio dimension at 32K (ref 500/100/50)
  for pd in 500 50; do
    for backend in fa_vattn_2mb fa_paged_256; do
      run_cfg 32768 $backend $pd 8 8
    done
  done
fi
if [ "$TIER" = "full" ]; then
  run_cfg 65536 fa_vattn_256kb 100 4 6
  run_cfg 131072 fa_vattn_256kb 100 2 4
  # fp8 KV pair (both engines quantized) at 64K
  for backend in fa_vattn_2mb fa_paged_256; do
    run_cfg 65536 $backend 100 4 6 fp8
  done
fi
echo "grid done"
