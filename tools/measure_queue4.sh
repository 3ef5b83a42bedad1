#!/bin/bash
# Round-5 phase-4 TPU measurements: the pallasg2 headline follow-ups.
# 1. batch-512 probe under pallasg2 (queue 3's 512 OOM was pallasp's gathered
#    (B·R³, K, t³, F) temp pair, which pallasg2 never materializes).
# 2. full official-style ladder with the reordered group B (pallasg2 rows
#    lead) — validates what the driver will run at round end.
# 3. phase-3 training batch 128 (the remat fix had headroom left at 64).
# Usage: bash tools/measure_queue4.sh [logdir]   (default /tmp/measure_r5d)
set -u
LOG=${1:-/tmp/measure_r5d}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  timeout -k 30 "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$LOG/queue.log"
  tail -4 "$LOG/$name.log" | tee -a "$LOG/queue.log"
}

# smallest-compile-first insurance + transport health signal
run dispatch_floor 480 python bench_dispatch.py

# 1. batch-512 pallasg2 probe (auto kNN rule picks streaming at this Q)
run g2_b512 1200 python bench.py --one simple 512 fused+pallasg2+topk1p

# 2. official-style full ladder (reordered group B)
run ladder_full 1500 python bench.py

# 3. phase-3 training batch 128 + remat + bf16
run p3_b128 1500 python bench_train.py 128 1 1 3 0

echo "QUEUE4 DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
