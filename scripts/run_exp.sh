#!/usr/bin/env bash
# Two-stage OFB pipeline (reference exp_sh/run_exp.sh):
#   stage 1: search until fuse_point, fuse the best supernet
#   stage 2: resume the (fused) search for the remaining epochs
#   stage 3: export + finetune the discovered subnet
#
# Usage: DATA=/path/to/imagenet bash scripts/run_exp.sh runs/exp
set -euo pipefail

EXP=${1:-runs/exp}
DATA=${DATA:-/data/imagenet}
MODEL=${MODEL:-deit_small_patch16_224_mim}
TARGET_FLOPS=${TARGET_FLOPS:-1.0}
EPOCHS=${EPOCHS:-100}
FUSE_POINT=${FUSE_POINT:-50}
BATCH=${BATCH:-128}
cd "$(dirname "$0")/.."

# stage 1: search to the fuse point (reference run_exp.sh:15)
python scripts/search.py --data-path "$DATA" --data-set IMNET \
    --model "$MODEL" --target_flops "$TARGET_FLOPS" \
    --epochs "$EPOCHS" --fuse_point "$FUSE_POINT" --batch-size "$BATCH" \
    --output_dir "$EXP" 2>&1 | tee "$EXP-Search.log"

# stage 2: resume from the running checkpoint for the remaining epochs
# (reference run_exp.sh:17)
python scripts/search.py --data-path "$DATA" --data-set IMNET \
    --model "$MODEL" --target_flops "$TARGET_FLOPS" \
    --epochs "$EPOCHS" --fuse_point "$EPOCHS" --batch-size "$BATCH" \
    --output_dir "$EXP" --resume --checkpoint "$EXP/running_ckpt" \
    2>&1 | tee -a "$EXP-Search.log"

# stage 3: export + finetune (reference run_exp.sh:22)
python scripts/export.py --checkpoint "$EXP/best" --out "$EXP/exported" \
    --model "$MODEL"
python scripts/finetune.py --data-path "$DATA" --data-set IMNET \
    --finetune "$EXP/exported" --epochs 300 --batch-size "$BATCH" \
    --output_dir "$EXP-ft" 2>&1 | tee "$EXP-Finetune.log"
