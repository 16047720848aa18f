#!/bin/bash
# Long-context static-trace A/B grid on one TPU chip.
#
# ref grid: scripts/benchmark_e2e_static_trace.py:7-13 -- ctx {32K, 64K,
# 128K} x P:D {500,100,50} x backends {fa_vattn_2mb, fa_vattn_256kb,
# fa_paged_256, fi_paged_16 analog}, makespan metric
# (process_e2e_static.py:20-27).
#
# Model: yi-6b-200k-l16 (real Yi-6B per-layer geometry, half depth so
# 128K KV + bf16 weights fit 16GiB -- the reference ran 80GB A100s),
# plus second geometries (GQA-8 mistral-style, MQA falcon-style) so the
# A/B is not shape-tuned.  KV dtype: bf16 (the reference grid does not
# quantize KV); the fp8 pair is run as an explicit extra dimension --
# BOTH engines quantize.
#
# IMPORTANT: cells must run EXCLUSIVELY -- a concurrent CPU-heavy
# process (even a pytest run) starves XLA/Mosaic compilation and
# poisons the makespan by minutes.  Each cell self-warms (the harness
# warmup request compiles BOTH serving signatures now that the prefill
# region is fixed-width), so makespans contain no compile stalls and
# warm/cold cache state cannot skew a cell.
#
# TIER selects cell groups (comma-separated list, or an alias):
#   pairs      -- ctx-sweep vattn-vs-paged pairs at P:D 100 (north star)
#   controls   -- strongest-baseline decomposition: fa_paged_256 at
#                 512-wide tiles (PAGED_WIDE_TILE=512, 2 DMAs/tile) and
#                 fa_vattn_2mb at 256-wide tiles (VATTN_WIDE_TILE=256),
#                 at 32K and 128K
#   extras32   -- 256kb page size, small-block paged, P:D 500/50 at 32K
#   pd64k      -- P:D 500/50 at 64K
#   models     -- second geometries at 32K P:D 100 (mistral GQA-8,
#                 falcon MQA)
#   fullextras -- 256kb at 64K/128K + the fp8 pair at 64K
#   tuned      -- tuned-tiling frontier (1024-wide kv + 256-row q
#                 tiles, BOTH engines) at 32K and 128K
#   pod        -- fa_pod cells at 32K/64K P:D 100
# Aliases: headline = pairs,extras32; full = everything;
#          extras = everything except pairs (resume a truncated full).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
MODEL=yi-6b-200k-l16
OUT=benchmark_output/longctx
mkdir -p "$OUT"

# run_cfg ctx backend pd batch nreq [kvq] [variant] [model]
#   kvq:     none|fp8
#   variant: none|w512|w256 (wide-tile control knobs, tag suffix)
#   model:   short grid-model name (yi|mistral|falcon); yi is the
#            default and gets no tag suffix
run_cfg () {
  local ctx=$1 backend=$2 pd=$3 batch=$4 nreq=$5 kvq=${6:-none}
  local variant=${7:-none} mshort=${8:-yi}
  local decode=$(( ctx / (pd + 1) )); [ $decode -lt 1 ] && decode=1
  local prefill=$(( ctx - decode ))
  local tag="${backend}"
  local kvflag="" envpre="" mname=$MODEL
  [ "$kvq" != "none" ] && { tag="${tag}_${kvq}"; kvflag="--kv-quant $kvq"; }
  case "$variant" in
    none) ;;
    w512) tag="${tag}_w512"; envpre="PAGED_WIDE_TILE=512" ;;
    w256) tag="${tag}_w256"; envpre="VATTN_WIDE_TILE=256" ;;
    # tuned tiling frontier: 1024-wide kv tiles + 256-row q tiles cut
    # the attention grid's per-step fixed cost ~4x at depth (PERF.md
    # "prefill roofline"); the arena fetches a 1024 tile as ONE DMA,
    # the paged twin as 4 block DMAs
    tuned)  tag="${tag}_tuned"
            envpre="VATTN_WIDE_TILE=1024 PAGED_WIDE_TILE=1024 VATTN_Q_TILE=256" ;;
    *) echo "unknown variant $variant" >&2; exit 2 ;;
  esac
  case "$mshort" in
    yi) ;;
    mistral) tag="${tag}_mmistral"; mname=mistral-7b-32k-l8 ;;
    falcon)  tag="${tag}_mfalcon";  mname=falcon-7b-32k-l8 ;;
    *) echo "unknown model $mshort" >&2; exit 2 ;;
  esac
  tag="${tag}_c${ctx}_pd${pd}"
  echo "=== $tag (B=$batch n=$nreq) ==="
  for attempt in 1 2; do
    env $envpre timeout 2400 python -m vattention_tpu.benchmark.main \
      --model $mname --load-format zero $kvflag \
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

TIER=${TIER:-full}
case "$TIER" in
  headline) TIER="pairs,extras32" ;;
  full)     TIER="pairs,controls,pod,extras32,pd64k,models,fullextras,tuned" ;;
  extras)   TIER="controls,pod,extras32,pd64k,models,fullextras,tuned" ;;
esac
has_group () { case ",$TIER," in *",$1,"*) return 0 ;; *) return 1 ;; esac; }
for g in ${TIER//,/ }; do
  case "$g" in pairs|controls|extras32|pd64k|models|fullextras|pod|tuned) ;;
    *) echo "unknown TIER group: $g" >&2; exit 2 ;;
  esac
done

# Groups run in value order so a truncated chip-hour budget still
# yields the north-star evidence first.

# 1. ctx sweep at P:D 100, the north-star A/B pair per ctx
if has_group pairs; then
  for ctx_b_n in "32768 8 8" "65536 4 6" "131072 2 4"; do
    set -- $ctx_b_n
    for backend in fa_vattn_2mb fa_paged_256; do
      run_cfg $1 $backend 100 $2 $3
    done
  done
fi
# 2. strongest-baseline controls (the 4-way tile-width decomposition)
if has_group controls; then
  run_cfg 32768  fa_paged_256 100 8 8 none w512
  run_cfg 32768  fa_vattn_2mb 100 8 8 none w256
  run_cfg 131072 fa_paged_256 100 2 4 none w512
  run_cfg 131072 fa_vattn_2mb 100 2 4 none w256
fi
# 3. page-size + small-block-paged + P:D dimensions at 32K
if has_group extras32; then
  run_cfg 32768 fa_vattn_256kb 100 8 8
  run_cfg 32768 fa_paged_16 100 8 8
  for pd in 500 50; do
    for backend in fa_vattn_2mb fa_paged_256; do
      run_cfg 32768 $backend $pd 8 8
    done
  done
fi
# 4. P:D dimension at 64K
if has_group pd64k; then
  for pd in 500 50; do
    for backend in fa_vattn_2mb fa_paged_256; do
      run_cfg 65536 $backend $pd 4 6
    done
  done
fi
# 5. second model geometries at 32K P:D 100
if has_group models; then
  for backend in fa_vattn_2mb fa_paged_256; do
    run_cfg 32768 $backend 100 8 8 none none mistral
  done
  for backend in fa_vattn_2mb fa_paged_256; do
    run_cfg 32768 $backend 100 8 8 none none falcon
  done
fi
# 6. 256kb at depth + the fp8 and int8 pairs (both engines quantized)
if has_group fullextras; then
  run_cfg 65536 fa_vattn_256kb 100 4 6
  run_cfg 131072 fa_vattn_256kb 100 2 4
  for backend in fa_vattn_2mb fa_paged_256; do
    run_cfg 65536 $backend 100 4 6 fp8
  done
  for backend in fa_vattn_2mb fa_paged_256; do
    run_cfg 65536 $backend 100 4 6 int8
  done
fi
# 6b. tuned-tiling frontier cells (both engines at their tuned best)
if has_group tuned; then
  for cell in "32768 8 8" "131072 2 4"; do
    set -- $cell
    for backend in fa_vattn_2mb fa_paged_256; do
      run_cfg $1 $backend 100 $2 $3 none tuned
    done
  done
fi
# 7. POD fused-kernel cells.  The fused kernel compiles once per
# schedule-length bucket; a first (discarded) run warms every bucket
# through the persistent compilation cache so the measured run's
# makespan is compile-free like the self-warming serial cells.
if has_group pod; then
  for cell in "32768 8 8" "65536 4 6"; do
    set -- $cell
    run_cfg $1 fa_pod 100 $2 $3
    mv "$OUT/fa_pod_c${1}_pd100" "$OUT/warm_pod_c${1}" 2>/dev/null
    run_cfg $1 fa_pod 100 $2 $3
    rm -rf "$OUT/warm_pod_c${1}"
  done
fi
echo "grid done"
