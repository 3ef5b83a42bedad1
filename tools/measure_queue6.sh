#!/bin/bash
# Round-5 phase-6 TPU measurements: the CompactPackedDecoder (cdec) —
# conv2+head+tanh as ONE Pallas kernel via in-VMEM 4³ im2col (full lanes at
# 2.37x FLOPs, ZERO (2S)³ HBM intermediates). The r5 ablation put the
# decoder at 53 ms/batch-256 against a 9.1 ms MXU floor, and its 64³ HLO
# temps were the measured b512 OOM blocker — cdec attacks both at once.
# Usage: bash tools/measure_queue6.sh [logdir]   (default /tmp/measure_r5f)
set -u
LOG=${1:-/tmp/measure_r5f}
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

# 1. cdec at the headline batches (vs pallasg2's 2016.7 / 2048.4 official)
run cdec_b256 1200 python bench.py --one simple 256 fused+cdec+pallasg2+topk1p
run cdec_b384 1200 python bench.py --one simple 384 fused+cdec+pallasg2+topk1p

# 2. batch 512: the decoder's 64³ HLO temps are gone under cdec — the last
#    measured OOM was 260 MB over with those temps dominating (BENCH_NOTES r5)
run cdec_b512 1200 python bench.py --one simple 512 fused+cdec+pallasg2+topk1p

# 3. honest serial device time at 256
run cdec_b256_chained 1200 python bench.py --one chained 256 fused+cdec+pallasg2+topk1p

echo "QUEUE6 DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
