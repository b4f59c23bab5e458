#!/usr/bin/env bash
# Round-4 TPU queue, part B — the stages the original r4_queue.sh never
# reached (the running copy predated commit 82b1198; it exited after the
# organic-kill search). Run AFTER the organic search is done.
#
#   A. finetune the ORGANIC export (runs/organic_a8/running_ckpt, epoch 99,
#      23/24 modules organically converged, searched 1.071 GFLOPs vs
#      target 1.15) -> runs/organic_a8/torganic/ft  (t* layout so
#      ladder_hard_eval.py discovers it)
#   B. hard-val generalization rows for the organic rung (same probes as
#      the r3 ladder so rows are directly comparable)
#   C. STATUS manifests
#   D. OFB-Swin 2-rung ladder (VERDICT r3 #6) + swin hard-eval
#
# Usage: nohup bash scripts/r4b_queue.sh > /tmp/r4b_queue.log 2>&1 &
#        echo $! > /tmp/r4b_queue.pid
set -uo pipefail
cd "$(dirname "$0")/.."

EXP=runs/organic_a8

echo "=== stage A: finetune the organic export ($(date)) ==="
mkdir -p "$EXP/torganic"
python scripts/finetune.py --data-path /tmp/imfolder --data-set IMNET \
    --finetune "$EXP/running_ckpt" --epochs 60 --batch-size 256 \
    --cache-device --planned-epoch --output_dir "$EXP/torganic/ft" \
    2>&1 | tee "$EXP/finetune.log"

echo "=== stage B: organic-rung hard-val eval ($(date)) ==="
timeout 5400 python scripts/ladder_hard_eval.py --root "$EXP" \
  --val-roots /tmp/imfolder /tmp/imf_hard_n060 /tmp/imf_hard_n090 /tmp/imf_hard_n120 \
  || true

echo "=== stage C: STATUS manifests ==="
python scripts/run_status.py --root "$EXP" || true

echo "=== stage D: Swin ladder ($(date)) ==="
DATA=/tmp/imfolder bash scripts/ladder_swin.sh runs/ladder_swin_r4 || true
python scripts/run_status.py --root runs/ladder_swin_r4 || true

echo "=== r4b queue FULLY done at $(date) ==="
