#!/usr/bin/env bash
# Round-5 TPU queue, part B — run after r5_queue.sh's stages B (Swin
# ladder) and C (DeiT-B rung) complete.
#
# Exists because round-4 model WEIGHTS did not survive the round boundary:
# runs/**/params.msgpack is gitignored and /tmp is wiped, so only
# meta.json (architectures, accuracies) persists. The seeded hard-eval
# (VERDICT r4 ask 5) and the KD teacher (ask 7b) therefore need the
# DeiT-S ladder regenerated. That regeneration doubles as the ask-8
# recipe-tweak demonstration: rungs run with --min-lr-arch 3e-4 (15% of
# the 2e-3 peak), the floor that scripts/alpha_tail.py says the
# convergence tail needs (both round-4 flatliners were still descending
# when the shared cosine froze them just above the kill threshold).
#
# Stages D'/E'/F' duplicate r5_queue.sh's D/E/F guards on the same output
# dirs, reordered shortest-first, so whichever script runs first does the
# work and the other skips.
#
# Usage: setsid nohup bash scripts/r5b_queue.sh > /tmp/r5b_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
echo "r5b queue starting at $(date)"

DATA=/tmp/imfolder
SEED_ROOTS="/tmp/imfolder \
  /tmp/imf_hard_n060 /tmp/imf_hard_n060_s17 /tmp/imf_hard_n060_s27 \
  /tmp/imf_hard_n090 /tmp/imf_hard_n090_s17 /tmp/imf_hard_n090_s27 \
  /tmp/imf_hard_n120 /tmp/imf_hard_n120_s17 /tmp/imf_hard_n120_s27"

# ---- G: DeiT-S organic ladder regen with the arch-LR floor.
#         ladder_imnet.sh is rung/stage-resumable; organic recipe
#         (fuse_point = epochs, export from running_ckpt) + the floor.
if [ ! -f runs/ladder_r5/summary.log ]; then
  echo "=== stage G: DeiT-S ladder w/ arch-LR floor ($(date)) ==="
  for attempt in 1 2 3; do
    if FUSE_POINT=100 FT_FROM=running_ckpt \
       SEARCH_EXTRA="--model-ema --ckpt-every 10 --eval-every 5 --min-lr-arch 3e-4" \
       DATA=$DATA bash scripts/ladder_imnet.sh runs/ladder_r5; then
      break
    fi
    echo "--- stage G attempt $attempt failed; retrying (resumable) at $(date)"
    sleep 30
  done
fi

# ---- H: seeded hard-eval over the regenerated ladder (+ tail analysis)
if [ ! -f runs/ladder_r5/hard_eval.json ]; then
  echo "=== stage H: seeded hard-eval ($(date)) ==="
  timeout 7200 python scripts/ladder_hard_eval.py \
      --root runs/ladder_r5 --val-roots $SEED_ROOTS --seed-summary \
      2>&1 | tee runs/ladder_r5/hard_eval_seeds.log || true
  for t in t0.25 t0.45 t0.70; do
    [ -f "runs/ladder_r5/$t/alpha.txt" ] && \
      python scripts/alpha_tail.py "runs/ladder_r5/$t/alpha.txt" \
        2>&1 | tee "runs/ladder_r5/$t/alpha_tail.log" || true
    python scripts/prune_timeline.py runs/ladder_r5/$t/search*.log \
      --log-txt "runs/ladder_r5/$t/log.txt" \
      --json-out "runs/ladder_r5/$t/prune_timeline.json" || true
  done
fi

# ---- F': distilled search demo (teacher = the regenerated dense_ft)
F_OUT=runs/distill_demo
mkdir -p "$F_OUT"
F_EP=$(python - "$F_OUT/running_ckpt" <<'PY'
import json, os, sys
p = os.path.join(sys.argv[1], "meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
PY
)
if [ "$F_EP" -lt 29 ] && [ -f runs/ladder_r5/dense_ft/best/meta.json ]; then
  echo "=== stage F': distilled search demo ($(date)) ==="
  RESUME=""
  [ "$F_EP" -ge 0 ] && RESUME="--resume --checkpoint $F_OUT/running_ckpt"
  python scripts/search.py --data-path $DATA --data-set IMNET \
      --model deit_small_patch16_224_mim --target_flops 2.070 \
      --epochs 30 --fuse_point 30 --batch-size 256 \
      --w_flops 2000 --blr_arch 2e-3 \
      --distillation-type hard \
      --teacher-path runs/ladder_r5/dense_ft/best \
      --model-ema --ckpt-every 10 --eval-every 5 \
      --accum-iter 1 --cache-device --planned-epoch \
      --output_dir "$F_OUT" $RESUME 2>&1 | tee -a "$F_OUT/search.log" || true
fi

# ---- E': patch-search demo (same guards as r5_queue.sh stage E)
E_OUT=runs/patch_demo
mkdir -p "$E_OUT"
if [ ! -f "$E_OUT/ft/best/meta.json" ]; then
  echo "=== stage E': patch-search demo ($(date)) ==="
  E_EP=$(python - "$E_OUT/running_ckpt" <<'PY'
import json, os, sys
p = os.path.join(sys.argv[1], "meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
PY
)
  RESUME=""
  [ "$E_EP" -ge 0 ] && RESUME="--resume --checkpoint $E_OUT/running_ckpt"
  if [ "$E_EP" -lt 59 ]; then
    python scripts/search.py --data-path $DATA --data-set IMNET \
        --model deit_small_patch16_224_mim --target_flops 2.070 \
        --epochs 60 --fuse_point 60 --batch-size 256 \
        --w_flops 2000 --blr_arch 2e-3 --w_patch 0.5 \
        --model-ema --ckpt-every 10 --eval-every 5 \
        --accum-iter 1 --cache-device --planned-epoch \
        --output_dir "$E_OUT" $RESUME 2>&1 | tee -a "$E_OUT/search.log" || true
  fi
  python scripts/finetune.py --data-path $DATA --data-set IMNET \
      --finetune "$E_OUT/running_ckpt" --epochs 20 --batch-size 256 \
      --cache-device --planned-epoch --output_dir "$E_OUT/ft" \
      2>&1 | tee -a "$E_OUT/finetune.log" || true
  python scripts/prune_timeline.py "$E_OUT"/search.log \
      --log-txt "$E_OUT/log.txt" \
      --json-out "$E_OUT/prune_timeline.json" || true
fi

# ---- D': 1x arch-LR organic run (same guards as r5_queue.sh stage D)
D_OUT=runs/organic_1x
mkdir -p "$D_OUT"
D_EP=$(python - "$D_OUT/running_ckpt" <<'PY'
import json, os, sys
p = os.path.join(sys.argv[1], "meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
PY
)
if [ "$D_EP" -lt 299 ]; then
  echo "=== stage D': 1x arch-LR organic run ($(date), resume epoch $D_EP) ==="
  RESUME=""
  [ "$D_EP" -ge 0 ] && RESUME="--resume --checkpoint $D_OUT/running_ckpt"
  python scripts/search.py --data-path $DATA --data-set IMNET \
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

echo "=== r5b queue FULLY done at $(date) ==="
