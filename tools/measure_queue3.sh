#!/bin/bash
# Round-5 phase-3 TPU measurements: the attention-complex lever (pallasg2 /
# flatg end-to-end serving rows) and the batch-512 streaming-kNN headline
# probe (r4's 512 OOM was the dense (Q, N) f32 score-matrix pair, which the
# streaming kernel never materializes).
# Usage: bash tools/measure_queue3.sh [logdir]   (default /tmp/measure_r5c)
set -u
LOG=${1:-/tmp/measure_r5c}
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

# 0. transport floor (cheap, decomposes later rows)
run dispatch_floor 480 python bench_dispatch.py

# 1. fused-gather v2 attention end-to-end: replaces the 1.07 GB XLA gather +
#    2.14 GB swap transpose (the 52%-of-serving layout work) with in-kernel
#    double-buffered row DMAs. Smallest batch first: a known-unknown remote
#    compile (manual DMAs) must fail cheap.
run g2_b64 900 python bench.py --one simple 64 fused+pallasg2+topk1p
run g2_b256 900 python bench.py --one simple 256 fused+pallasg2+topk1p
run g2_b384 900 python bench.py --one simple 384 fused+pallasg2+topk1p

# 2. flat-gather packedrows (one take at idx*t3+t, no swap transpose): the
#    low-risk half of the same lever, keeps the proven kernel
run flatg_b256 900 python bench.py --one simple 256 fused+pallasp+flatg+topk1p
run flatg_b384 900 python bench.py --one simple 384 fused+pallasp+flatg+topk1p

# 3. batch-512 headline probe under streaming kNN (the OOM'd score matrix is
#    gone; decoder remat is not in the serving path so HBM should fit)
run b512_stream 900 python bench.py --one simple 512 fused+pallasp+streamknn+topk1p

# 4. pallasg2 group-size sweep at the winning batch (env-tunable DMA depth)
run g2_b256_grp8  900 env RF_ATTN_GATHER_GROUP=8  python bench.py --one simple 256 fused+pallasg2+topk1p
run g2_b256_grp32 900 env RF_ATTN_GATHER_GROUP=32 python bench.py --one simple 256 fused+pallasg2+topk1p

echo "QUEUE3 DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
