"""Export CLI: searched supernet checkpoint -> compact dense checkpoint.

The standalone analog of the reference's in-loader `intersect`
(reference finetune.py:182-249) — materializes the pruned subnet once so
finetune / serving load a genuinely small model.

  python scripts/export.py --checkpoint runs/exp/best --out runs/exp/exported
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="searched supernet checkpoint dir")
    ap.add_argument("--out", required=True, help="output checkpoint dir")
    ap.add_argument("--model", default="deit_small_patch16_224_mim")
    ap.add_argument("--num-classes", type=int, default=None,
                    help="override; default inferred from the search "
                         "run's recorded dataset (1000 if unknown)")
    ap.add_argument("--no-fuse", action="store_true")
    args = ap.parse_args()

    import jax
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.core.export import export_subnet, exported_param_count
    from ofb_tpu.models.registry import create_model

    meta = ckpt.latest_meta(args.checkpoint)
    saved_args = (meta or {}).get("args", {})
    model_name = saved_args.get("model", args.model)
    # derive the class count from the search run's dataset (the search CLI
    # infers it the same way); an explicit --num-classes still overrides
    _DS_CLASSES = {"DIGITS": 10, "CIFAR10": 10, "CIFAR100": 100,
                   "IMNET100": 100, "IMNET": 1000}
    ds_name = str(saved_args.get("data_set", "")).upper()
    if args.num_classes is not None:
        nb_classes = args.num_classes
    elif ds_name in _DS_CLASSES:
        nb_classes = _DS_CLASSES[ds_name]
    elif ds_name == "SYNTHETIC":
        nb_classes = saved_args.get("synthetic_num_classes", 1000)
    else:
        nb_classes = 1000
    if saved_args.get("tiny_test"):
        from ofb_tpu.models.registry import ModelBundle
        from ofb_tpu.models.search_space import SearchSpace
        from ofb_tpu.models.vit import ModelCfg
        td, tdep, th = saved_args.get("tiny_dims", (32, 2, 2))
        cfg = ModelCfg(img_size=32, patch_size=8,
                       num_classes=nb_classes, embed_dim=td,
                       depth=tdep, num_heads=th, mlp_ratio=2.0)
        space = SearchSpace.build(td, tdep, th, cfg.hidden, cfg.num_patches,
                                  patch_search=True)
        bundle = ModelBundle(name="tiny", cfg=cfg, kind="mim", space=space)
    else:
        bundle = create_model(model_name, num_classes=nb_classes)
    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    restored = ckpt.load_checkpoint(args.checkpoint, params=params,
                                    alphas=alphas, arch=arch)
    params = restored["params"]
    alphas = restored.get("alphas", alphas)
    arch = restored.get("arch", arch)

    # force-finish an unconverged search (reference finetune.py:199-201)
    from ofb_tpu.core.compress import compress as run_compress
    guard = 0
    while not arch.all_finished and guard < 20:
        params, alphas, arch, _, rep = run_compress(params, alphas, arch,
                                                    None, bundle.space,
                                                    thresh=1.0)
        guard += 1
        print("force-finish:", "; ".join(rep.events) or "(no event)")

    dense, dense_cfg, export_meta = export_subnet(
        params, arch, bundle.space, bundle.cfg, fuse=not args.no_fuse)
    n = exported_param_count(dense)
    print(f"exported model: D={dense_cfg.embed_dim}, "
          f"blocks={dense_cfg.block_overrides}, params={n / 1e6:.2f}M")
    ckpt.save_checkpoint(args.out, params=dense, meta={
        "exported": True, "model_cfg": dataclasses.asdict(dense_cfg),
        "export": export_meta, "source": args.checkpoint,
        "params_m": n / 1e6})
    print(f"saved to {args.out}")


if __name__ == "__main__":
    main()
