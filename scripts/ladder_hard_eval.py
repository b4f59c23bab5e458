"""Re-evaluate the IMNET ladder's finetuned models on harder val sets.

The ladder's training val set (make_imagefolder.py --noise 0.35) saturates:
even the most-compressed rung reaches ~100% top-1 within two finetune
epochs, so the ladder table's accuracy column cannot separate capacities.
This script restores the accuracy axis by evaluating every exported +
finetuned rung (and the dense comparator) on *held-out* val sets drawn
from the same class patterns at higher noise — a generalization probe
where model capacity actually shows (the reference's ladder uses real
ImageNet-1k val for the same purpose, README.md:19-25; no real ImageNet
exists on this machine).

Each model is loaded and compiled ONCE and then evaluated on every val
root (compiles dominate on the TPU relay — 3-6 min fresh — so the loop
nesting is model-outer, dataset-inner).

Usage:
  python scripts/make_imagefolder.py --root /tmp/imf_hard_n060 \
      --classes 100 --per-class 0 --val-per-class 25 --noise 0.60 --seed 7
  python scripts/ladder_hard_eval.py --root runs/ladder_imnet_r3 \
      --val-roots /tmp/imfolder /tmp/imf_hard_n060 /tmp/imf_hard_n090

Writes <root>/hard_eval.json and prints one table row per model.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def eval_model(best_dir: str, val_roots, batch_size: int, compute_dtype):
    """Top-1 of the exported checkpoint at ``best_dir`` on each val root.

    Same geometry => same compiled program: the per-rung best/final pair
    reuses one jit cache entry, so the second checkpoint costs eval time
    only.
    """
    import jax

    from ofb_tpu.config import DataConfig
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.core.engine import evaluate
    from ofb_tpu.core.steps import make_eval_step_dense
    from ofb_tpu.data.datasets import build_dataset
    from ofb_tpu.data.pipeline import device_feed, make_epoch_loader
    from ofb_tpu.models.vit import ModelCfg, init_vit_params

    meta = ckpt.latest_meta(best_dir)
    if meta is None or not meta.get("exported"):
        raise SystemExit(f"{best_dir}: not an exported checkpoint")
    cfg = ckpt.model_cfg_from_meta(meta["model_cfg"], ModelCfg)
    tpl = init_vit_params(jax.random.PRNGKey(0), cfg)
    restored = ckpt.load_checkpoint(best_dir, params=tpl, ema_params=tpl)
    params = restored.get("params")
    step = make_eval_step_dense(cfg, compute_dtype=compute_dtype)

    accs = {}
    for vroot in val_roots:
        dcfg = DataConfig(data_path=vroot, data_set="IMNET",
                          input_size=cfg.img_size, batch_size=batch_size)
        ds_val, _ = build_dataset(False, dcfg, staging=256)
        loader = make_epoch_loader(ds_val, epoch=0, rank=0, world=1,
                                   batch_size=batch_size,
                                   repeated_aug=False, train=False)
        feed = device_feed(loader, rng=jax.random.PRNGKey(0), train=False,
                           accum_iter=1, out_size=cfg.img_size)
        stats = evaluate(step, feed, params)
        accs[vroot] = stats["acc1"]
        print(f"  {best_dir} @ {vroot}: acc1={stats['acc1']:.2f}",
              flush=True)
    return accs, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/ladder_imnet_r3")
    ap.add_argument("--val-roots", nargs="+",
                    default=["/tmp/imfolder", "/tmp/imf_hard_n060",
                             "/tmp/imf_hard_n090", "/tmp/imf_hard_n120"])
    ap.add_argument("--batch-size", type=int, default=250)
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax.numpy as jnp
    compute = jnp.bfloat16 if args.compute_dtype == "bfloat16" \
        else jnp.float32

    # Under a saturated training val set, "best" snapshots the FIRST epoch
    # to hit the ceiling (early weights); the final-epoch weights live in
    # running_ckpt. Evaluate both so the hard-val columns compare
    # fully-trained models, with the best-ckpt rows as the early-stop view.
    targets = []
    for name, ftdir in [("dense", os.path.join(args.root, "dense_ft"))] + [
            (os.path.basename(t), os.path.join(t, "ft"))
            for t in sorted(glob.glob(os.path.join(args.root, "t*")))]:
        for kind, sub in (("best", "best"), ("final", "running_ckpt")):
            d = os.path.join(ftdir, sub)
            if os.path.exists(os.path.join(d, "meta.json")):
                targets.append((f"{name}/{kind}", d))

    rows = []
    for name, best in targets:
        accs, meta = eval_model(best, args.val_roots, args.batch_size,
                                compute)
        rows.append({"name": name, "checkpoint": best, "acc1": accs,
                     "train_val_acc1": meta.get("acc1")})

    out = os.path.join(args.root, "hard_eval.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)

    names = [os.path.basename(v) for v in args.val_roots]
    print(f"{'model':>8} " + " ".join(f"{n:>16}" for n in names), flush=True)
    for r in rows:
        print(f"{r['name']:>8} " + " ".join(
            f"{r['acc1'][v]:>16.2f}" for v in args.val_roots), flush=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
