#!/bin/bash
# Round-5 phase-2 measurements: waits for the phase-1 queue to drain, then
# runs the attention-complex attribution (the 52%-of-serving lever) and a
# full ladder validation of the best-of-2 bench fix.
# Usage: bash tools/measure_queue2.sh [phase1_logdir] [logdir]
set -u
PREV=${1:-/tmp/measure_r5}
LOG=${2:-/tmp/measure_r5b}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

# wait (up to 90 min) for phase 1 to finish so the chip is uncontended
for i in $(seq 1 540); do
  grep -q "QUEUE DONE" "$PREV/queue.log" 2>/dev/null && break
  sleep 10
done

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  timeout -k 30 "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$LOG/queue.log"
  tail -4 "$LOG/$name.log" | tee -a "$LOG/queue.log"
}

# 1. attention-complex stage attribution (gather/swap/relayout/kernel-tile
#    sweep/XLA alternative) at the flagship batch-256 shape
run attn_stages 1800 python bench_attn.py

# 2. full ladder with the best-of-2 windows + reordered group B (validates
#    the VERDICT item-2 fix against the 1775.7 interactive reference row)
run ladder_full 1500 python bench.py

# 3. streaming-kNN serving A/B: shipped fast variant with forced streaming
#    (the r5 auto-rule picks it at Q>=8192; this pins the end-to-end win)
run serve_denseknn 900 python bench.py --one simple 256 fused+pallasp+topk1p+denseknn

echo "QUEUE2 DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
