#!/usr/bin/env bash
# Round-4 TPU queue, part C — the ORGANIC ladder: re-run the t0.45/t0.70
# registry-geometry rungs with the measured organic-kill recipe
# (blr_arch x8 + EMA + thinned readbacks, no force-finish), so all three
# ladder points come from organically-converged searches:
#   t0.25 = runs/organic_a8 (already done; symlinked in)
#   dense = runs/ladder_imnet_r3/dense_ft (same finetune recipe; symlinked)
# Ends with hard-val rows + summary over the combined root.
#
# Usage: nohup bash scripts/r4c_queue.sh [wait_pid] > /tmp/r4c_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to exit..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "pid $WAIT_PID exited at $(date)"
  sleep 10
fi

ROOT=runs/ladder_organic
mkdir -p "$ROOT"
# organic_a8 IS the t0.25 rung (target 1.15 = 0.25 x 4.6 dense GFLOPs);
# its finetune lives at torganic/ft — bridge so the t*/ft layout holds.
[ -e runs/organic_a8/ft ] || ln -s torganic/ft runs/organic_a8/ft
[ -e "$ROOT/t0.25" ] || ln -s ../organic_a8 "$ROOT/t0.25"
# dense comparator: same recipe, already trained in the r3 ladder
[ -e "$ROOT/dense_ft" ] || ln -s ../ladder_imnet_r3/dense_ft "$ROOT/dense_ft"
[ -e "$ROOT/dense_ft.log" ] || ln -s ../ladder_imnet_r3/dense_ft.log "$ROOT/dense_ft.log" 2>/dev/null || true

echo "=== organic ladder rungs t0.45 t0.70 ($(date)) ==="
# the ladder driver is resumable; retry so a relay disconnect (seen once
# in the organic_a8 run) resumes from running_ckpt instead of dying
for attempt in 1 2 3; do
  if TARGETS="0.45 0.70" FUSE_POINT=100 FT_FROM=running_ckpt \
     SEARCH_EXTRA="--model-ema --ckpt-every 10 --eval-every 5" \
     DATA=/tmp/imfolder bash scripts/ladder_imnet.sh "$ROOT"; then
    break
  fi
  echo "--- ladder attempt $attempt failed; retrying (resumable) at $(date)"
  sleep 30
done

echo "=== organic-ladder hard-val rows ($(date)) ==="
timeout 7200 python scripts/ladder_hard_eval.py --root "$ROOT" \
  --val-roots /tmp/imfolder /tmp/imf_hard_n060 /tmp/imf_hard_n090 /tmp/imf_hard_n120 \
  || true
python scripts/ladder_imnet_summary.py --root "$ROOT" 2>&1 | tee "$ROOT/summary.log" || true
python scripts/run_status.py --root "$ROOT" || true

echo "=== r4c queue FULLY done at $(date) ==="
