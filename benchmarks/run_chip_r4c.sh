#!/bin/bash
# Round-4 third chip session: stage-boundary fences + xb=1 warp + r34 sweep.
set -u
OUT=${1:-/tmp/chip_r4c}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
export JAX_COMPILATION_CACHE_DIR=/tmp/alink_jax_cache
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%T)) ===" | tee -a "$OUT/session.log"
  timeout "$tmo" "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  echo "rc=$?" | tee -a "$OUT/session.log"
  tail -c 700 "$OUT/$name.json" | tee -a "$OUT/session.log"; echo | tee -a "$OUT/session.log"
}
run micro_typical 3000 python benchmarks/exp_cascade_micro.py
run r34_sweep 3000 python benchmarks/bench_r34_sweep.py
run bench_official 2400 python bench.py
echo "DONE $(date)" | tee -a "$OUT/session.log"
