#!/usr/bin/env bash
# Round-5 TPU hardware queue — the VERDICT r4 "do this" list, ordered so an
# early death still lands the quick high-value items. Every stage is
# guarded by its output artifact, so relaunching this script never repeats
# finished work (and mid-run deaths resume from running_ckpt where the
# underlying driver supports it).
#
# Stages (VERDICT r4 ask in parens):
#   A (5) seeded hard-eval error bars for the beats-dense headline
#   B (1) OFB-Swin organic ladder, batch 128, resumable rungs
#   C (2) DeiT-B 8.7-GFLOP E-analog rung + dense comparator
#   D (3) 1x arch-LR organic run: reference blr_arch 2.5e-4, 300-epoch
#         cosine horizon (the alpha-sharpening model's kill projection)
#   E (7a) patch (token-count) search demo: w_patch 0.5, export + short ft
#   F (7b) distilled search demo: hard KD from the dense_ft comparator
#
# Usage: setsid nohup bash scripts/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
echo "r5 queue starting at $(date)"

DATA=/tmp/imfolder
SEED_ROOTS="/tmp/imfolder \
  /tmp/imf_hard_n060 /tmp/imf_hard_n060_s17 /tmp/imf_hard_n060_s27 \
  /tmp/imf_hard_n090 /tmp/imf_hard_n090_s17 /tmp/imf_hard_n090_s27 \
  /tmp/imf_hard_n120 /tmp/imf_hard_n120_s17 /tmp/imf_hard_n120_s27"

# ---- A: seeded hard-eval (writes hard_eval_seeds.json; keeps the round-4
#         hard_eval.json intact via --out)
if [ ! -f runs/ladder_organic/hard_eval_seeds.json ]; then
  echo "=== stage A: seeded hard-eval ($(date)) ==="
  timeout 7200 python scripts/ladder_hard_eval.py \
      --root runs/ladder_organic --val-roots $SEED_ROOTS --seed-summary \
      --out runs/ladder_organic/hard_eval_seeds.json \
      2>&1 | tee runs/ladder_organic/hard_eval_seeds.log || true
fi

# ---- B: OFB-Swin ladder (rungs resume from running_ckpt; completed rungs
#         skipped by model_finetuned guard inside ladder_swin.sh)
if [ ! -f runs/ladder_swin_r5/hard_eval.json ]; then
  echo "=== stage B: swin ladder ($(date)) ==="
  DATA=$DATA bash scripts/ladder_swin.sh runs/ladder_swin_r5 \
      2>&1 | tee -a runs/ladder_swin_r5/queue.log || true
fi

# ---- C: DeiT-B E-analog (r4d_queue is itself guarded + retried)
if [ ! -f runs/ladder_organic_b/summary.log ]; then
  echo "=== stage C: DeiT-B E-analog ($(date)) ==="
  bash scripts/r4d_queue.sh 2>&1 | tee -a runs/r4d_queue.log || true
fi

# ---- D: 1x arch-LR organic run (reference recipe, long horizon).
#         fuse_point=epochs + no force-finish = purely organic; 300-epoch
#         cosine so arch LR hasn't decayed when the projected drift
#         threshold (~own-epoch-101-equivalent at 8x) arrives.
D_OUT=runs/organic_1x
mkdir -p "$D_OUT"
D_EP=$(python - "$D_OUT/running_ckpt" <<'PY'
import json, os, sys
p = os.path.join(sys.argv[1], "meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
PY
)
if [ "$D_EP" -lt 299 ]; then
  echo "=== stage D: 1x arch-LR organic run ($(date), resume epoch $D_EP) ==="
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

# ---- E: patch-search demo (w_patch 0.5 turns the patch FLOPs selector
#         on; organic recipe otherwise; export + short ft proves the
#         sliced model)
E_OUT=runs/patch_demo
mkdir -p "$E_OUT"
if [ ! -f "$E_OUT/ft/best/meta.json" ]; then
  echo "=== stage E: patch-search demo ($(date)) ==="
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

# ---- F: distilled search demo (hard KD; teacher = the round-4 dense
#         DeiT-S comparator loaded from its native checkpoint dir)
F_OUT=runs/distill_demo
mkdir -p "$F_OUT"
F_EP=$(python - "$F_OUT/running_ckpt" <<'PY'
import json, os, sys
p = os.path.join(sys.argv[1], "meta.json")
print(json.load(open(p)).get("epoch", -1) if os.path.exists(p) else -1)
PY
)
if [ "$F_EP" -lt 29 ]; then
  echo "=== stage F: distilled search demo ($(date)) ==="
  RESUME=""
  [ "$F_EP" -ge 0 ] && RESUME="--resume --checkpoint $F_OUT/running_ckpt"
  python scripts/search.py --data-path $DATA --data-set IMNET \
      --model deit_small_patch16_224_mim --target_flops 2.070 \
      --epochs 30 --fuse_point 30 --batch-size 256 \
      --w_flops 2000 --blr_arch 2e-3 \
      --distillation-type hard \
      --teacher-path runs/ladder_organic/dense_ft/best \
      --model-ema --ckpt-every 10 --eval-every 5 \
      --accum-iter 1 --cache-device --planned-epoch \
      --output_dir "$F_OUT" $RESUME 2>&1 | tee -a "$F_OUT/search.log" || true
fi

echo "=== r5 queue FULLY done at $(date) ==="
