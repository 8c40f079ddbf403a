#!/bin/bash
# Auto-restarting supervisor for multi-hour north-star Gram assemblies.
#
# The remote-TPU worker wedges roughly 1-in-10 multi-hour runs (a dispatch
# hangs forever at ~0% host CPU, or dies with a transient
# ResourceExhausted). With --resume-gram every completed [block, block]
# dispatch is already on disk, so the cheapest reliability layer is
# supervision: watch the log mtime, kill-and-relaunch on stall, stop when
# the pipeline prints its total. A restart costs one in-flight block
# (~9 s), not the run.
#
# Usage:
#   scripts/supervise_north_star.sh LOGFILE RESUME_DIR N_TRAIN [EXTRA...]
# e.g.
#   scripts/supervise_north_star.sh .runs/ns50k.log .runs/gram50k 50000
set -u
LOG=$1; RESUME=$2; NTRAIN=$3; shift 3
STALL_S=${STALL_S:-900}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-20}
cd "$(dirname "$0")/.."
mkdir -p "$RESUME"

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "[supervisor] attempt $attempt $(date -u +%H:%M:%S)" >> "$LOG"
  python examples/cifar_myrtle.py --n-train "$NTRAIN" --n-test 512 \
    --image-size 32 --fused on --chol auto \
    --resume-gram "$RESUME" "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "$PID" > "${LOG}.pid"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 120
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "[supervisor] stalled ${age}s, restarting" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  grep -q "pipeline total" "$LOG" && { echo "[supervisor] done" >> "$LOG"; exit 0; }
  sleep 5
done
echo "[supervisor] gave up after $MAX_ATTEMPTS attempts" >> "$LOG"
exit 1
