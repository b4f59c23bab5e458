#!/usr/bin/env bash
# Round-4 TPU queue, part E — retry of the Swin ladder (r4b stage D OOMed
# at batch 256 with the device cache resident; ladder_swin.sh now
# defaults to the HBM-safe benched batch 128).
#
# Usage: nohup bash scripts/r4e_queue.sh [wait_pid] > /tmp/r4e_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to exit..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "pid $WAIT_PID exited at $(date)"
  sleep 10
fi

echo "=== Swin ladder retry at batch 128 ($(date)) ==="
DATA=/tmp/imfolder bash scripts/ladder_swin.sh runs/ladder_swin_r4 || true
python scripts/run_status.py --root runs/ladder_swin_r4 || true

echo "=== r4e queue FULLY done at $(date) ==="
