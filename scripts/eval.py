"""Evaluation CLI: top-1/top-5 of a checkpoint on a validation set.

Covers the reference's standalone eval paths (engine.py:222-291) for both
searched supernets (soft accuracy) and exported dense models.

  python scripts/eval.py --checkpoint runs/exp/best --data-set IMNET \
      --data-path /data/imagenet
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", default="deit_small_patch16_224_mim")
    ap.add_argument("--data-path", default="")
    ap.add_argument("--data-set", default="IMNET")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--input-size", type=int, default=224)
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--compute-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ofb_tpu.config import DataConfig
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.core.engine import evaluate
    from ofb_tpu.core.steps import make_eval_step, make_eval_step_dense
    from ofb_tpu.data.datasets import build_dataset
    from ofb_tpu.data.pipeline import device_feed, make_epoch_loader
    from ofb_tpu.models.registry import create_model
    from ofb_tpu.models.vit import ModelCfg, init_vit_params

    compute = jnp.bfloat16 if args.compute_dtype == "bfloat16" \
        else jnp.float32
    meta = ckpt.latest_meta(args.checkpoint)
    if meta is None:
        raise SystemExit(f"no checkpoint at {args.checkpoint}")

    # the restored model's img_size drives the eval input size (a stale
    # --input-size flag would otherwise feed mismatched shapes)
    input_size = args.input_size
    if meta.get("exported"):
        if "model_cfg" not in meta:
            raise SystemExit(
                f"{args.checkpoint} predates model_cfg metadata — "
                "re-export it (scripts/export.py or the search CLI)")
        input_size = meta["model_cfg"].get("img_size", input_size)

    dcfg = DataConfig(data_path=args.data_path, data_set=args.data_set,
                      input_size=input_size, batch_size=args.batch_size)
    ds_val, nb_classes = build_dataset(False, dcfg, staging=256)

    if meta.get("family") == "swin" and meta.get("exported"):
        # exported Swin subnet: sliced per-block widths live in the param
        # shapes (swin_forward is shape-driven), so restore template-free
        from ofb_tpu.core.swin_steps import make_swin_eval_step_dense
        from ofb_tpu.models.swin import SwinCfg
        swcfg = ckpt.model_cfg_from_meta(meta["model_cfg"], SwinCfg)
        raw = ckpt.load_checkpoint_raw(args.checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, raw["params"])
        step = make_swin_eval_step_dense(swcfg, compute_dtype=compute)
        state_args = (params,)
    elif meta.get("exported"):
        cfg = ckpt.model_cfg_from_meta(meta["model_cfg"], ModelCfg)
        tpl = init_vit_params(jax.random.PRNGKey(0), cfg)
        restored = ckpt.load_checkpoint(args.checkpoint, params=tpl,
                                        ema_params=tpl)
        params = restored.get("ema" if args.use_ema else "params",
                              restored.get("params"))
        step = make_eval_step_dense(cfg, compute_dtype=compute)
        state_args = (params,)
    else:
        bundle = create_model(meta.get("args", {}).get("model", args.model),
                              num_classes=nb_classes)
        params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
        restored = ckpt.load_checkpoint(args.checkpoint, params=params,
                                        alphas=alphas, arch=arch)
        step = make_eval_step(bundle.space, bundle.cfg,
                              compute_dtype=compute)
        state_args = (restored["params"], restored.get("alphas", alphas),
                      restored.get("arch", arch))

    loader = make_epoch_loader(ds_val, epoch=0, rank=jax.process_index(),
                               world=jax.process_count(),
                               batch_size=args.batch_size,
                               repeated_aug=False, train=False)
    feed = device_feed(loader, rng=jax.random.PRNGKey(0), train=False,
                       accum_iter=1, out_size=input_size)
    stats = evaluate(step, feed, *state_args)
    print(stats)


if __name__ == "__main__":
    main()
