#!/bin/bash
# Round-5 TPU measurement queue — run on a healthy tunnel, highest-value first
# (VERDICT r4 order; the tunnel can wedge mid-queue, so early rows matter most).
# Usage: bash tools/measure_queue.sh [logdir]   (default /tmp/measure_r5)
set -u
LOG=${1:-/tmp/measure_r5}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG/queue.log"
  # -k 30: SIGKILL backstop; tools with warm children (bench.py,
  # bench_ablate.py) install SIGTERM handlers that kill the child and
  # harvest partial rows — the outer timeout must exceed any INNER timeout
  # (bench_ablate's sweep child budget is 2400 s) so the graceful path wins.
  timeout -k 30 "$t" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "$name rc=$rc" | tee -a "$LOG/queue.log"
  tail -4 "$LOG/$name.log" | tee -a "$LOG/queue.log"
}

# 0. Per-execute transport-latency floor (cheap; decomposes every later row
#    into dispatch_floor + t_device)
run dispatch_floor 480 python bench_dispatch.py

# 1. VERDICT item 1: post-pallasp+topk1p full ablation @256 — the roofline-gap
#    attribution (outer 2700 > inner 2400 so partial rows always harvest)
run ablate_sweep 2700 python bench_ablate.py --sweep 256 fused+pallasp+topk1p

# 2. VERDICT item 5: kNN strategies at the serving shape (Q=16384, N=27132)
#    incl. the streaming fused score+select tile sweep
run knn27k 1200 python bench_knn27k.py

# 3. VERDICT item 3: dconv explicit-pad re-probe, smallest batch first
run dconv_b64 900 python bench.py --one simple 64 fused+pallasp+topk1p+dconv
run dconv_b128 900 python bench.py --one simple 128 fused+pallasp+topk1p+dconv
run dconv_b256 900 python bench.py --one simple 256 fused+pallasp+topk1p+dconv

# 4. VERDICT item 4: phase-3 training sweep (batch x remat; bf16 on)
run p3_b16 900 python bench_train.py 16 1 1 3 0
run p3_b32 900 python bench_train.py 32 1 1 3 0
run p3_b64 900 python bench_train.py 64 1 1 3 0

# 5. VERDICT item 2: reproduce the 384 headline on a warm transport with the
#    best-of-2 measurement windows
run serve_b384 900 python bench.py --one simple 384 fused+pallasp+topk1p

echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
