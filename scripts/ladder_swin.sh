#!/usr/bin/env bash
# OFB-Swin accuracy-vs-FLOPs ladder at registry geometry on the file-based
# ImageFolder (the OFB-Swin-A/B/C analog — reference README.md:27-31),
# through the all-in-one Swin search CLI (search -> force-finish export ->
# sliced-subnet finetune in one invocation).
#
# Targets straddle the ~2.54 GFLOPs uniform-alpha expectation of the
# swin_tiny supernet (dense = 4.52 GFLOPs) so each rung pulls a distinct
# direction, mirroring scripts/ladder_imnet.sh.
#
# BLR_ARCH defaults to the measured organic-kill recipe: alpha drift is
# linear in arch lr and the 20k-image cache gives 64x fewer arch steps per
# epoch than the reference's ImageNet runs; 8x restores per-epoch search
# dynamics (scripts/alpha_dynamics.py projection; BENCH.md round 4).
#
# Usage: DATA=/tmp/imfolder bash scripts/ladder_swin.sh runs/ladder_swin
set -euo pipefail

EXP_ROOT=${1:-runs/ladder_swin}
DATA=${DATA:-/tmp/imfolder}
MODEL=${MODEL:-swin_tiny_patch4_window7_224_mim}
EPOCHS=${EPOCHS:-60}
# batch 128 is the benched Swin search config AND the HBM-safe one with
# the 3.85 GiB --cache-device staging set resident: batch 256 + cache
# OOMs (measured: 17.09G needed vs 15.75G, r4b queue). Arch drift/epoch
# is batch-invariant (lr_arch scales by eff_batch/256, steps/epoch by
# its inverse), so the organic recipe transfers unchanged.
BATCH=${BATCH:-128}
FT_EPOCHS=${FT_EPOCHS:-40}
DENSE_GFLOPS=4.519   # swin_model_flops() dense term of the swin_tiny supernet
# 0.95 is the near-dense capacity reference (force-finish at the top of
# the ratio grid keeps ~everything) — the ladder's "dense row" without a
# separate dense-Swin trainer; 0.45/0.70 straddle the ~0.56x uniform-
# alpha expectation.
TARGETS=${TARGETS:-"0.45 0.70 0.95"}
W_FLOPS=${W_FLOPS:-2000}
BLR_ARCH=${BLR_ARCH:-2e-3}
cd "$(dirname "$0")/.."
mkdir -p "$EXP_ROOT"

for FRAC in $TARGETS; do
  TGT=$(python -c "print(f'{$DENSE_GFLOPS * $FRAC:.3f}')")
  EXP="$EXP_ROOT/t$FRAC"
  mkdir -p "$EXP"
  if [ -f "$EXP/model_finetuned/meta.json" ]; then
    echo "=== swin target $FRAC already complete (model_finetuned present); skipping ==="
    continue
  fi
  echo "=== swin target $FRAC x dense = $TGT GFLOPs -> $EXP ==="
  # outer retry: --auto-resume covers transient in-process relay errors,
  # but a killed PROCESS (session death, OOM-killer) needs this loop; a
  # running_ckpt left by the previous attempt turns the retry into a
  # resume instead of a from-scratch repeat (search epochs only — the
  # ft stage re-runs from model_exported, which is saved atomically)
  for attempt in 1 2 3; do
    RESUME=""
    [ -f "$EXP/running_ckpt/meta.json" ] && RESUME="--resume"
    if python scripts/search_swin.py --data-path "$DATA" --data-set IMNET \
        --model "$MODEL" --target_flops "$TGT" --w_flops "$W_FLOPS" \
        --blr_arch "$BLR_ARCH" \
        --epochs "$EPOCHS" --batch-size "$BATCH" --embed_search \
        --cache-device --planned-epoch --force-finish \
        --export-finetune-epochs "$FT_EPOCHS" \
        --output_dir "$EXP" $RESUME \
        2>&1 | tee -a "$EXP/search.log"; then
      break
    fi
    echo "!!! rung $FRAC attempt $attempt failed at $(date); retrying"
    sleep 30
  done
  [ -f "$EXP/model_finetuned/meta.json" ] \
      || echo "!!! rung $FRAC FAILED after 3 attempts (continuing)"
done

# hard-val generalization rows for every exported+finetuned rung
python scripts/ladder_hard_eval.py --root "$EXP_ROOT" --family swin \
    2>&1 | tee "$EXP_ROOT/hard_eval.log" || true

# organic prune-event timeline per rung (the blr_arch x8 recipe fires
# kills on DeiT-S; this records whether it does on Swin too)
for FRAC in $TARGETS; do
  EXP="$EXP_ROOT/t$FRAC"
  [ -f "$EXP/search.log" ] && python scripts/prune_timeline.py \
      "$EXP/search.log" --log-txt "$EXP/log.txt" \
      --json-out "$EXP/prune_timeline.json" || true
done

echo "=== swin ladder complete; per-target logs under $EXP_ROOT ==="
