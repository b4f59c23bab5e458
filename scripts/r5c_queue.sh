#!/usr/bin/env bash
# Round-5 follow-up queue — takes over when r5_queue.sh exits. Exists
# because the round has ~5h of TPU wall-clock left while r5_queue's
# remaining stages need ~9h: stages C-F were diverted out of the (running,
# hence uneditable) r5_queue.sh via placeholder guard artifacts, and this
# script re-runs the surviving priorities in VERDICT-r4 order under a hard
# deadline, so the driver's end-of-round bench.py never contends with a
# live run.
#
# Order + why:
#   1. dense Swin-T comparator — the ladder's "dense row" (VERDICT ask 1
#      done-criteria). Replaces the t0.95 rung: a real from-scratch dense
#      model for 40 ft epochs instead of 60 search + 40 ft epochs.
#   2. seeded Swin hard-eval — error bars (ask 5) applied to in-round
#      models; the round-4 DeiT ladder's weights did not survive the
#      round boundary (params.msgpack is gitignored), so the original
#      "re-probe the round-4 models at 3 seeds" is unrecoverable in-budget.
#   3. DeiT-B E-analog rung (ask 2; scripts/r4d_queue.sh, resumable, its
#      hard-eval already uses the 3-seed probe set).
#   4. 1x arch-LR organic run (ask 3) until the deadline — resumable; a
#      partial run still answers the question if kills fire inside it.
#   5. patch-search demo, distilled-search demo (ask 7) if time remains.
#
# Usage: setsid nohup bash scripts/r5c_queue.sh <r5_queue_pid> \
#          > /tmp/r5c_queue.log 2>&1 < /dev/null &
set -uo pipefail
cd "$(dirname "$0")/.."

# no stage STARTS after SOFT_TS; every stage is timeout-capped near HARD_TS
SOFT_TS=${SOFT_TS:-$(date -ud "2026-08-19 15:50" +%s)}
HARD_TS=${HARD_TS:-$(date -ud "2026-08-19 16:10" +%s)}
left() { echo $(( HARD_TS - $(date +%s) )); }
soft_ok() { [ "$(date +%s)" -lt "$SOFT_TS" ]; }
cap() { L=$(left); [ "$L" -lt 60 ] && L=60; [ "$L" -gt "${1:-99999}" ] && L=$1; echo "$L"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null \
   && tr '\0' ' ' < "/proc/$WAIT_PID/cmdline" | grep -q r5_queue; then
  echo "waiting for r5_queue pid $WAIT_PID..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "r5_queue exited at $(date)"
  sleep 10
fi

# remove the placeholder guards this script owns (created to divert
# r5_queue stages; each is a meta.json/log with a "placeholder" marker)
python - <<'PY'
import json, os, shutil
def is_ph(p):
    try:
        return "placeholder" in json.load(open(p))
    except Exception:
        return False
for p, d in [
    ("runs/ladder_swin_r5/t0.95/model_finetuned/meta.json",
     "runs/ladder_swin_r5/t0.95"),
    ("runs/organic_1x/running_ckpt/meta.json",
     "runs/organic_1x/running_ckpt"),
    ("runs/patch_demo/ft/best/meta.json", "runs/patch_demo/ft"),
    ("runs/distill_demo/running_ckpt/meta.json",
     "runs/distill_demo/running_ckpt"),
]:
    if os.path.exists(p) and is_ph(p):
        shutil.rmtree(d)
        print("removed placeholder", d)
p = "runs/ladder_organic_b/summary.log"
if os.path.exists(p) and "placeholder" in open(p).read():
    os.remove(p)
    print("removed placeholder", p)
PY

DATA=/tmp/imfolder
SEED_ROOTS="/tmp/imfolder \
  /tmp/imf_hard_n060 /tmp/imf_hard_n060_s17 /tmp/imf_hard_n060_s27 \
  /tmp/imf_hard_n090 /tmp/imf_hard_n090_s17 /tmp/imf_hard_n090_s27 \
  /tmp/imf_hard_n120 /tmp/imf_hard_n120_s17 /tmp/imf_hard_n120_s27"

# ---- 1: dense Swin-T comparator (same ft recipe as the rungs)
D=runs/ladder_swin_r5/dense_ft
if soft_ok && [ ! -f "$D/model_finetuned/meta.json" ]; then
  echo "=== r5c stage 1: dense Swin-T comparator ($(date)) ==="
  mkdir -p "$D"
  for attempt in 1 2; do
    R=""
    [ -f "$D/running_ckpt/meta.json" ] && R="--resume"
    if timeout "$(cap 3600)" python scripts/train_swin_dense.py \
        --data-path $DATA --data-set IMNET \
        --model swin_tiny_patch4_window7_224 \
        --epochs 40 --batch-size 128 --cache-device --planned-epoch \
        --output_dir "$D" $R 2>&1 | tee -a "$D/train.log"; then
      break
    fi
    echo "--- dense swin attempt $attempt failed; retrying"
    sleep 20
  done
fi

# ---- 2: seeded Swin hard-eval (error bars; includes the dense row)
SW=runs/ladder_swin_r5
if [ ! -f "$SW/hard_eval_seeds.json" ] && [ "$(left)" -gt 300 ]; then
  echo "=== r5c stage 2: seeded swin hard-eval ($(date)) ==="
  timeout "$(cap 2700)" python scripts/ladder_hard_eval.py \
      --root "$SW" --family swin --val-roots $SEED_ROOTS --seed-summary \
      --out "$SW/hard_eval_seeds.json" \
      2>&1 | tee "$SW/hard_eval_seeds.log" || true
fi

# ---- 3: DeiT-B E-analog (resumable; internal retries + seeded hard-eval).
#          Reserve ~35 min behind it: if the training outruns the clock,
#          the timeout must not ALSO kill the rung's hard-eval/summary —
#          those re-run below, cheap and guarded, so a trained-but-
#          unevaluated rung still gets its accuracy rows.
if soft_ok && [ ! -f runs/ladder_organic_b/summary.log ]; then
  echo "=== r5c stage 3: DeiT-B E-analog ($(date)) ==="
  C_CAP=$(( $(left) - 2100 )); [ "$C_CAP" -lt 120 ] && C_CAP=120
  timeout "$C_CAP" bash scripts/r4d_queue.sh \
      2>&1 | tee -a /tmp/r4d_queue.log || true
fi
BROOT=runs/ladder_organic_b
if [ ! -f "$BROOT/summary.log" ] \
   && [ -f "$BROOT/t0.4964/ft/best/meta.json" ] && [ "$(left)" -gt 420 ]; then
  echo "=== r5c stage 3b: DeiT-B eval/summary catch-up ($(date)) ==="
  timeout "$(cap 1200)" python scripts/ladder_hard_eval.py --root "$BROOT" \
      --val-roots $SEED_ROOTS --seed-summary || true
  python scripts/ladder_imnet_summary.py --root "$BROOT" \
      --dense-gflops 17.525 2>&1 | tee "$BROOT/summary.log" || true
  python scripts/prune_timeline.py "$BROOT"/t0.4964/search*.log \
      --log-txt "$BROOT/t0.4964/log.txt" \
      --json-out "$BROOT/t0.4964/prune_timeline.json" || true
fi

# ---- 4: 1x arch-LR organic run until the deadline (resumable)
D_OUT=runs/organic_1x
mkdir -p "$D_OUT"
if soft_ok; then
  D_EP=$(python - "$D_OUT/running_ckpt" <<'PY'
import json, os, sys
p = os.path.join(sys.argv[1], "meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
PY
)
  if [ "$D_EP" -lt 299 ]; then
    echo "=== r5c stage 4: 1x arch-LR organic run ($(date), resume $D_EP) ==="
    RESUME=""
    [ "$D_EP" -ge 0 ] && RESUME="--resume --checkpoint $D_OUT/running_ckpt"
    timeout "$(cap 99999)" python scripts/search.py \
        --data-path $DATA --data-set IMNET \
        --model deit_small_patch16_224_mim --target_flops 2.070 \
        --epochs 300 --fuse_point 300 --batch-size 256 \
        --w_flops 2000 --blr_arch 2.5e-4 \
        --model-ema --ckpt-every 10 --eval-every 10 \
        --accum-iter 1 --cache-device --planned-epoch \
        --output_dir "$D_OUT" $RESUME 2>&1 | tee -a "$D_OUT/search.log" || true
    python scripts/prune_timeline.py "$D_OUT"/search.log \
        --log-txt "$D_OUT/log.txt" \
        --json-out "$D_OUT/prune_timeline.json" || true
  fi
fi

# ---- 5: patch-search demo (only with generous time left)
E_OUT=runs/patch_demo
if soft_ok && [ "$(left)" -gt 3000 ] && [ ! -f "$E_OUT/ft/best/meta.json" ]; then
  echo "=== r5c stage 5: patch-search demo ($(date)) ==="
  mkdir -p "$E_OUT"
  E_EP=$(python - "$E_OUT/running_ckpt" <<'PY'
import json, os, sys
p = os.path.join(sys.argv[1], "meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
PY
)
  RESUME=""
  [ "$E_EP" -ge 0 ] && RESUME="--resume --checkpoint $E_OUT/running_ckpt"
  if [ "$E_EP" -lt 59 ]; then
    timeout "$(cap 99999)" python scripts/search.py \
        --data-path $DATA --data-set IMNET \
        --model deit_small_patch16_224_mim --target_flops 2.070 \
        --epochs 60 --fuse_point 60 --batch-size 256 \
        --w_flops 2000 --blr_arch 2e-3 --w_patch 0.5 \
        --model-ema --ckpt-every 10 --eval-every 5 \
        --accum-iter 1 --cache-device --planned-epoch \
        --output_dir "$E_OUT" $RESUME 2>&1 | tee -a "$E_OUT/search.log" || true
  fi
  if [ "$(left)" -gt 900 ]; then
    timeout "$(cap 99999)" python scripts/finetune.py \
        --data-path $DATA --data-set IMNET \
        --finetune "$E_OUT/running_ckpt" --epochs 20 --batch-size 256 \
        --cache-device --planned-epoch --output_dir "$E_OUT/ft" \
        2>&1 | tee -a "$E_OUT/finetune.log" || true
  fi
  python scripts/prune_timeline.py "$E_OUT"/search.log \
      --log-txt "$E_OUT/log.txt" \
      --json-out "$E_OUT/prune_timeline.json" || true
fi

# ---- 6: distilled search demo — teacher = the DeiT-B dense comparator
#          from stage 3 (native checkpoint; registry geometry)
F_OUT=runs/distill_demo
TEACH=runs/ladder_organic_b/dense_ft/best
if soft_ok && [ "$(left)" -gt 1800 ] && [ -f "$TEACH/meta.json" ]; then
  F_EP=$(python - "$F_OUT/running_ckpt" <<'PY'
import json, os, sys
p = os.path.join(sys.argv[1], "meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
PY
)
  if [ "$F_EP" -lt 29 ]; then
    echo "=== r5c stage 6: distilled search demo ($(date)) ==="
    mkdir -p "$F_OUT"
    RESUME=""
    [ "$F_EP" -ge 0 ] && RESUME="--resume --checkpoint $F_OUT/running_ckpt"
    timeout "$(cap 99999)" python scripts/search.py \
        --data-path $DATA --data-set IMNET \
        --model deit_small_patch16_224_mim --target_flops 2.070 \
        --epochs 30 --fuse_point 30 --batch-size 256 \
        --w_flops 2000 --blr_arch 2e-3 \
        --distillation-type hard \
        --teacher-model deit_base_patch16_224_finetune \
        --teacher-path "$TEACH" \
        --model-ema --ckpt-every 10 --eval-every 5 \
        --accum-iter 1 --cache-device --planned-epoch \
        --output_dir "$F_OUT" $RESUME 2>&1 | tee -a "$F_OUT/search.log" || true
  fi
fi

python scripts/run_status.py --root runs/ladder_swin_r5 || true
echo "=== r5c queue FULLY done at $(date) ==="
