#!/usr/bin/env bash
# Round-4 TPU queue, part D — the OFB-DeiT-E analog: an ORGANIC search at
# deit_base geometry targeting the reference's published E-level
# 8.7 GFLOPs (reference README.md:19-25 — OFB-DeiT-E: 8.7 G / 81.7% from
# deit_base), plus a from-scratch dense DeiT-B comparator and hard-val
# rows. Batch 64 (the benched DeiT-B config, 823 img/s, 43.9% MFU);
# blr_arch stays 2e-3 — lr_arch scales by eff_batch/256 (config.py:190)
# so drift-per-epoch matches the proven batch-256 recipe exactly
# (0.25x lr x 4x steps/epoch).
#
# Usage: nohup bash scripts/r4d_queue.sh [wait_pid] > /tmp/r4d_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to exit..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "pid $WAIT_PID exited at $(date)"
  sleep 10
fi

ROOT=runs/ladder_organic_b

echo "=== DeiT-B organic rung: target 8.7 GFLOPs ($(date)) ==="
for attempt in 1 2 3; do
  # batch 64 is the benched DeiT-B step config, but it was benched WITHOUT
  # the 3.85 GiB --cache-device staging set resident; if HBM overflows
  # (the Swin-ladder failure mode of round 4), halve the batch — lr_arch
  # scales by eff_batch/256 and steps/epoch by its inverse, so the
  # drift-per-epoch argument in the header is batch-invariant.
  B=64
  if grep -qs "RESOURCE_EXHAUSTED\|[Oo]ut of memory" \
      "$ROOT/t0.4964/search1.log"; then
    B=32
    echo "--- HBM OOM detected at batch 64; falling back to batch $B"
  fi
  if MODEL=deit_base_patch16_224_mim DENSE_GFLOPS=17.525 BATCH=$B \
     TARGETS="0.4964" FUSE_POINT=100 FT_FROM=running_ckpt \
     SEARCH_EXTRA="--model-ema --ckpt-every 10 --eval-every 5" \
     DATA=/tmp/imfolder bash scripts/ladder_imnet.sh "$ROOT"; then
    break
  fi
  echo "--- attempt $attempt failed; retrying (resumable) at $(date)"
  sleep 30
done

echo "=== DeiT-B hard-val rows ($(date)) ==="
timeout 7200 python scripts/ladder_hard_eval.py --root "$ROOT" \
  --val-roots /tmp/imfolder \
  /tmp/imf_hard_n060 /tmp/imf_hard_n060_s17 /tmp/imf_hard_n060_s27 \
  /tmp/imf_hard_n090 /tmp/imf_hard_n090_s17 /tmp/imf_hard_n090_s27 \
  /tmp/imf_hard_n120 /tmp/imf_hard_n120_s17 /tmp/imf_hard_n120_s27 \
  --seed-summary || true
python scripts/ladder_imnet_summary.py --root "$ROOT" --dense-gflops 17.525 \
    2>&1 | tee "$ROOT/summary.log" || true
python scripts/prune_timeline.py "$ROOT"/t0.4964/search*.log \
    --log-txt "$ROOT/t0.4964/log.txt" \
    --json-out "$ROOT/t0.4964/prune_timeline.json" || true
python scripts/run_status.py --root "$ROOT" || true

echo "=== r4d queue FULLY done at $(date) ==="
