#!/usr/bin/env bash
# Round-5 dataset regeneration (/tmp is wiped between rounds).
#  - /tmp/imfolder: the 21k-JPEG 100-class train/val folder every ladder
#    uses (manifest matches runs/*/hard_eval.json probe_cfg exactly).
#  - hard-val probes at noise 0.60/0.90/1.20: seed 7 keeps the round-3/4
#    names (so prior numbers reproduce), seeds 17 and 27 add the error-bar
#    replicates VERDICT r4 item 5 asks for.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ ! -f /tmp/imfolder/manifest.json ]; then
  python scripts/make_imagefolder.py --root /tmp/imfolder \
      --classes 100 --per-class 200 --val-per-class 10 \
      --noise 0.35 --seed 0
fi

for seed in 7 17 27; do
  for nz in 0.60 0.90 1.20; do
    tag=$(python -c "print(f'n{int(round($nz*100)):03d}')")
    root=/tmp/imf_hard_${tag}
    [ "$seed" != 7 ] && root=${root}_s${seed}
    [ -f "$root/manifest.json" ] && continue
    python scripts/make_imagefolder.py --root "$root" \
        --classes 100 --per-class 0 --val-per-class 25 \
        --noise "$nz" --seed "$seed"
  done
done
echo "r5 data generation done at $(date)"
