#!/bin/bash
# Round-4 mid-round chip session: cascade-glue rework measurements.
# Usage: bash benchmarks/run_chip_r4a.sh [outdir]
set -u
OUT=${1:-/tmp/chip_r4a}
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
  tail -c 600 "$OUT/$name.json" | tee -a "$OUT/session.log"
  echo | tee -a "$OUT/session.log"
  return $rc
}

# 1. Cascade micro, typical budgets (order-free NMS + bias init + xwin warp).
run micro_typical 3600 python benchmarks/exp_cascade_micro.py
# 2. Cascade micro, dense budgets (blocked NMS + tower whales).
export PROFILE=worst
run micro_worst 3600 python benchmarks/exp_cascade_micro.py
unset PROFILE
# 3. Tower glue per-op attribution (incl. pool_slices variant).
run tower_glue 3600 python benchmarks/bench_tower_glue.py
# 4. vmap-vs-flat tower premise check (VERDICT #4).
run flatten_towers 2400 python benchmarks/exp_flatten_towers.py
# 5. Live-threshold pipeline cost (VERDICT #7).
run live_thresholds 2400 python benchmarks/bench_live_thresholds.py
echo "DONE $(date)" | tee -a "$OUT/session.log"
