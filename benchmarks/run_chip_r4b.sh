#!/bin/bash
# Round-4 second chip session: tower fences + bf16 crops + warp A/B,
# then the official bench.
# Usage: bash benchmarks/run_chip_r4b.sh [outdir]
set -u
OUT=${1:-/tmp/chip_r4b}
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
  tail -c 700 "$OUT/$name.json" | tee -a "$OUT/session.log"
  echo | tee -a "$OUT/session.log"
  return $rc
}

# 1. Typical micro with tower fences + bf16 crop passthrough.
run micro_typical 3600 python benchmarks/exp_cascade_micro.py
# 2. Dense micro with the same.
export PROFILE=worst
run micro_worst 3600 python benchmarks/exp_cascade_micro.py
unset PROFILE
# 3. Warp x-window A/B across the alignment scale range.
run warp_xwin 2400 python benchmarks/exp_warp_xwin.py
# 4. Official bench (r34/r50/r100/worst) with everything in.
run bench_official 2400 python bench.py
echo "DONE $(date)" | tee -a "$OUT/session.log"
