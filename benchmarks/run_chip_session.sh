#!/bin/bash
# One-shot chip measurement session: runs every queued benchmark in
# priority order so a flaky tunnel still yields the headline numbers
# first.  Each bench gets its own timeout; results land in
# $OUT (default /tmp/chip_r2) as <name>.json plus a combined log.
#
# Usage:  bash benchmarks/run_chip_session.sh [outdir]
set -u
OUT=${1:-/tmp/chip_r2}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/alink_jax_cache

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  echo "rc=$rc" | tee -a "$OUT/session.log"
  tail -c 400 "$OUT/$name.json" | tee -a "$OUT/session.log"
  echo | tee -a "$OUT/session.log"
  return $rc
}

# 1. Headline: the driver-facing bench (typical pipeline + embed).
run bench_official 1700 python bench.py || exit 1
# 2. Both-profile pipeline bench (typical + worst_case budgets).
run bench_pipeline 1700 python benchmarks/bench_pipeline.py
# 3. Prefix attribution of the fused program (fusion-overhead hunt).
run exp_pipeline_prefix 1700 python benchmarks/exp_pipeline_prefix.py
# 4. Batch sweep at typical budgets.
run bench_pipeline_sweep 1700 python benchmarks/bench_pipeline_sweep.py
# 5. Pairwise slab kernel re-measure (doc says 156 TF/s — confirm).
run bench_pairwise 1700 python benchmarks/bench_pairwise.py
# 6. r50 embedder pipeline (secondary headline: smaller-backbone option).
run bench_r50_pipeline 1700 python benchmarks/bench_r50_pipeline.py
# 7. scan_units compile/runtime tradeoff on the real chip.
run bench_scan_embed 1700 python benchmarks/bench_scan_embed.py
# 8. scan_units effect on the fused pipeline (compile budget headroom).
run exp_scan_pipeline 1700 python benchmarks/exp_scan_pipeline.py
# 8b. Selection round (chunk-width bucketing changed the program shapes).
run bench_selection 1700 python benchmarks/bench_selection.py
# 9. Warm-cache re-run of the official bench: a clean steady-state number,
#    and it leaves /tmp/alink_jax_cache hot for the driver's round-end run.
run bench_official_warm 1700 python bench.py
echo "DONE $(date)" | tee -a "$OUT/session.log"
