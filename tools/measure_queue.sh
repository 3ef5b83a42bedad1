#!/bin/bash
# Round-4 TPU measurement queue — run on a healthy tunnel, highest-value first
# (the tunnel can wedge mid-queue; order = VERDICT r3 priority).
# Usage: bash tools/measure_queue.sh [logdir]   (default /tmp/measure_r4)
set -u
LOG=${1:-/tmp/measure_r4}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  timeout "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$LOG/queue.log"
  tail -3 "$LOG/$name.log" | tee -a "$LOG/queue.log"
}

# 0. Per-execute transport-latency floor (cheap; decomposes every later row
#    into dispatch_floor + t_device)
run dispatch_floor 480 python bench_dispatch.py

# 1. VERDICT item 3: phase-3 training, the missing sweep rows (remat amortizes
#    the dispatch floor at bigger batches)
run p3_b16_remat 900 python bench_train.py 16 1 1 3 0
run p3_b32_remat 900 python bench_train.py 32 1 1 3 0
run p3_b64_remat 900 python bench_train.py 64 1 1 3 0

# 2. Batch 384/512 serving under the shipped fast variant (possible new headline)
run serve_b384 900 python bench.py --one simple 384 fused+pallasp+topk1p
run serve_b512 900 python bench.py --one simple 512 fused+pallasp+topk1p

# 3. Post-pallasp full ablation @256 (stage attribution that timed out r3;
#    includes the round-4 'backbone' stand-in row)
run ablate_sweep 2400 python bench_ablate.py --sweep 256 fused+pallasp+topk1p

# 4. top-k strategy micro-bench at the serving shape
run topk_micro 900 python bench_topk.py

# 5. dconv re-probe (explicit-pad VALID convs) at smaller batch
run dconv_b128 600 python bench.py --one simple 128 fused+pallasp+topk1p+dconv

# 6. phase-3 batch 128 + remat (only worth trying if 64 compiled/fit)
run p3_b128_remat 900 python bench_train.py 128 1 1 3 0

echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
