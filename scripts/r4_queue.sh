#!/usr/bin/env bash
# Round-4 TPU work queue: runs AFTER the live ladder driver (r3 restart)
# finishes, so the relay TPU is never contended. Stages:
#   1. STATUS manifests for the finished ladder
#   2. kpad probe (VERDICT r3 #8: K=384 -> 512 contraction padding A/B)
#   3. hard-val eval over the finished ladder (VERDICT #1/#4)
#   4. organic-kill search: t0.25 geometry with blr_arch x8 (VERDICT #2/#3)
#      — alpha drift is linear in arch lr; the 20k cache gives 64x fewer
#      arch steps/epoch than reference ImageNet, and the measured drift
#      projects first kill at epoch ~101/lr_mult (scripts/alpha_dynamics.py)
# Usage: nohup bash scripts/r4_queue.sh <ladder_driver_pid> > /tmp/r4_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for ladder driver pid $WAIT_PID to exit..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "ladder driver exited at $(date)"
  sleep 10
fi

echo "=== stage 1: STATUS manifests ==="
python scripts/run_status.py --root runs/ladder_imnet_r3 || true

echo "=== stage 2: kpad probe ==="
timeout 1200 python scripts/kpad_probe.py | tee /tmp/kpad_probe.json || true

echo "=== stage 3: ladder hard-val eval ==="
timeout 5400 python scripts/ladder_hard_eval.py --root runs/ladder_imnet_r3 \
  --val-roots /tmp/imfolder /tmp/imf_hard_n060 /tmp/imf_hard_n090 /tmp/imf_hard_n120 \
  || true

echo "=== stage 3b: refresh summary with hard-val columns ==="
python scripts/ladder_imnet_summary.py --root runs/ladder_imnet_r3 || true

echo "=== stage 4: organic-kill search (blr_arch x8, t0.25 geometry) ==="
EXP=runs/organic_a8
mkdir -p "$EXP"
python scripts/search.py --data-path /tmp/imfolder --data-set IMNET \
    --model deit_small_patch16_224_mim --target_flops 1.15 \
    --epochs 100 --fuse_point 50 --batch-size 256 --w_flops 2000 \
    --blr_arch 2e-3 --model-ema --ckpt-every 10 --eval-every 5 \
    --accum-iter 1 --cache-device --planned-epoch --output_dir "$EXP" \
    2>&1 | tee "$EXP/search1.log"
python scripts/search.py --data-path /tmp/imfolder --data-set IMNET \
    --model deit_small_patch16_224_mim --target_flops 1.15 \
    --epochs 100 --fuse_point 100 --batch-size 256 --w_flops 2000 \
    --blr_arch 2e-3 --model-ema --ckpt-every 10 --eval-every 5 \
    --accum-iter 1 --cache-device --planned-epoch --output_dir "$EXP" \
    --resume --checkpoint "$EXP/running_ckpt" \
    2>&1 | tee "$EXP/search2.log"
grep -c "prune event" "$EXP"/search1.log "$EXP"/search2.log || true

echo "=== stage 5: finetune the organic-kill export (v2 rung for the table) ==="
python scripts/finetune.py --data-path /tmp/imfolder --data-set IMNET \
    --finetune "$EXP/best" --epochs 60 --batch-size 256 \
    --cache-device --planned-epoch --output_dir "$EXP/ft" \
    2>&1 | tee "$EXP/finetune.log" || true

echo "=== stage 6: organic-run analysis ==="
python scripts/alpha_dynamics.py "$EXP/alpha.txt" || true
python scripts/prune_timeline.py "$EXP"/search1.log "$EXP"/search2.log \
    --log-txt "$EXP/log.txt" --json-out "$EXP/prune_timeline.json" || true
python scripts/run_status.py --root runs/organic_a8 2>/dev/null || true

echo "=== stage 7: Swin ladder ==="
DATA=/tmp/imfolder bash scripts/ladder_swin.sh runs/ladder_swin_r4 || true

echo "=== r4 queue FULLY done at $(date) ==="

