#!/bin/bash
# Probe the TPU tunnel every PERIOD seconds; on the first healthy probe,
# fire $QUEUE (default tools/measure_queue.sh). Bounded by MAX_WAIT so it
# never outlives a session. Usage: bash tools/tunnel_watch.sh [logdir]
set -u
LOG=${1:-/tmp/measure_r4}
PERIOD=${PERIOD:-300}
MAX_WAIT=${MAX_WAIT:-2700}
QUEUE=${QUEUE:-tools/measure_queue.sh}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
start=$(date +%s)
n=0
while true; do
  n=$((n+1))
  echo "probe $n at $(date -u +%H:%M:%S)" | tee -a "$LOG/watch.log"
  if timeout 240 python tools/tpu_probe.py >"$LOG/probe_$n.log" 2>&1 \
     && grep -q PROBE_OK "$LOG/probe_$n.log"; then
    echo "tunnel healthy — firing measure queue" | tee -a "$LOG/watch.log"
    bash "$QUEUE" "$LOG"
    exit 0
  fi
  tail -1 "$LOG/probe_$n.log" | tee -a "$LOG/watch.log"
  now=$(date +%s)
  if [ $((now - start)) -ge "$MAX_WAIT" ]; then
    echo "watcher expired after $((now - start))s" | tee -a "$LOG/watch.log"
    exit 1
  fi
  sleep "$PERIOD"
done
