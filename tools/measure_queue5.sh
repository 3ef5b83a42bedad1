#!/bin/bash
# Round-5 phase-5 TPU measurements: the phibank (kernel-free) attention.
# phib precomputes the phi MLP over the static bank at engine build and
# serves with theta + a (Q, K) 4 KB phi-row gather + VPU score/hard-select
# + ONE selected 256 B patch row gather per output patch — no attention
# kernel, no 16 KB candidate-row traffic, no DMA-issue overhead.
# Usage: bash tools/measure_queue5.sh [logdir]   (default /tmp/measure_r5e)
set -u
LOG=${1:-/tmp/measure_r5e}
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

# 1. phib at the headline batches (vs pallasg2's 2018.2 / 2043.4)
run phib_b256 1200 python bench.py --one simple 256 fused+phib+topk1p
run phib_b384 1200 python bench.py --one simple 384 fused+phib+topk1p

# 2. batch 512: the attention temps are gone under phib; if the decoder's
#    64³ HLO temps still OOM this confirms the decoder as the 512 blocker
run phib_b512 1200 python bench.py --one simple 512 fused+phib+topk1p

# 3. honest serial device time at 256
run phib_b256_chained 1200 python bench.py --one chained 256 fused+phib+topk1p

echo "QUEUE5 DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
