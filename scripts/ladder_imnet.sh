#!/usr/bin/env bash
# Accuracy-vs-FLOPs ladder at REGISTRY GEOMETRY on a file-based ImageFolder
# (the OFB-DeiT-A..E analog at full DeiT-S/224 scale — reference
# README.md:19-25, run_exp.sh:10; scripts/ladder.py is the digits-scale
# version of the same deliverable).
#
# For each FLOPs target: two-stage search (fuse@50, reference cadence) then
# export + finetune, all through the real CLIs, fed from the on-device
# dataset cache (--cache-device) so the relay staging ceiling does not
# bound the run.
#
# Usage: DATA=/tmp/imfolder bash scripts/ladder_imnet.sh runs/ladder_imnet
set -euo pipefail

EXP_ROOT=${1:-runs/ladder_imnet}
DATA=${DATA:-/tmp/imfolder}
MODEL=${MODEL:-deit_small_patch16_224_mim}
EPOCHS=${EPOCHS:-100}
FUSE_POINT=${FUSE_POINT:-50}
BATCH=${BATCH:-256}
FT_EPOCHS=${FT_EPOCHS:-60}
DENSE_GFLOPS=4.600   # model_flops() of the dense deit_small supernet
# Rungs straddle the ~0.44x-dense expected FLOPs of the uniform-alpha
# init, spanning the reference ladder's A..D range (README.md:19-25:
# 0.9-3.4 GFLOPs on tiny/small): 0.25 pulls hard down, 0.45 holds, 0.70
# pulls up (keep more).
TARGETS=${TARGETS:-"0.25 0.45 0.70"}
# w_flops must be large enough that the FLOPs *selector* competes with
# the variance-term *amplifier* at this step count (16x shorter than the
# reference's 125k): measured alpha-grad l2 at init is 45 (variance) vs
# 0.009 (flops), and 10-epoch probes at w=5 and w=25 drifted identically
# AWAY from target. See BENCH.md "Why targets collapse to one attractor".
W_FLOPS=${W_FLOPS:-2000}
cd "$(dirname "$0")/.."
mkdir -p "$EXP_ROOT"

for FRAC in $TARGETS; do
  TGT=$(python -c "print(f'{$DENSE_GFLOPS * $FRAC:.3f}')")
  EXP="$EXP_ROOT/t$FRAC"
  mkdir -p "$EXP"
  echo "=== target $FRAC x dense = $TGT GFLOPs -> $EXP ==="

  # stage 1: search to the fuse point (reference run_exp.sh:15)
  python scripts/search.py --data-path "$DATA" --data-set IMNET \
      --model "$MODEL" --target_flops "$TGT" \
      --epochs "$EPOCHS" --fuse_point "$FUSE_POINT" --batch-size "$BATCH" --w_flops "$W_FLOPS" \
      --accum-iter 1 --cache-device --planned-epoch --output_dir "$EXP" \
      2>&1 | tee "$EXP/search1.log"

  # stage 2: resume for the remaining epochs (reference run_exp.sh:17)
  python scripts/search.py --data-path "$DATA" --data-set IMNET \
      --model "$MODEL" --target_flops "$TGT" \
      --epochs "$EPOCHS" --fuse_point "$EPOCHS" --batch-size "$BATCH" --w_flops "$W_FLOPS" \
      --accum-iter 1 --cache-device --planned-epoch --output_dir "$EXP" \
      --resume --checkpoint "$EXP/running_ckpt" \
      2>&1 | tee "$EXP/search2.log"

  # stage 3: export + finetune (reference run_exp.sh:22)
  python scripts/finetune.py --data-path "$DATA" --data-set IMNET \
      --finetune "$EXP/best" --epochs "$FT_EPOCHS" --batch-size "$BATCH" \
      --cache-device --planned-epoch --output_dir "$EXP/ft" \
      2>&1 | tee "$EXP/finetune.log"
done

# dense comparator: the SAME finetune recipe from a fresh dense init
# (ladder_imnet_summary.py reads it from <root>/dense_ft/best)
if [ ! -f "$EXP_ROOT/dense_ft/best/meta.json" ]; then
  python scripts/finetune.py --data-path "$DATA" --data-set IMNET \
      --model deit_small_patch16_224_finetune \
      --epochs "$FT_EPOCHS" --batch-size "$BATCH" \
      --cache-device --planned-epoch --output_dir "$EXP_ROOT/dense_ft" \
      2>&1 | tee "$EXP_ROOT/dense_ft.log"
fi

python scripts/ladder_imnet_summary.py --root "$EXP_ROOT" \
    2>&1 | tee "$EXP_ROOT/summary.log"

echo "=== ladder complete; per-target logs under $EXP_ROOT ==="
