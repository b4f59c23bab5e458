"""OFB-Swin search CLI — the OFB method on the Swin family.

The reference lists OFB-Swin results without shipping code
(reference README.md:27-31); this drives the searchable Swin
(models/swin_search.py: window-attention + MLP dims + per-stage embed
widths across patch merging) through the same epoch loop, compress state
machine, and checkpoint artifacts as the ViT search CLI.

Example (synthetic smoke):
  python scripts/search_swin.py --data-set SYNTHETIC --tiny-test \
      --epochs 2 --batch-size 8 --output_dir runs/swin_smoke
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("OFB TPU Swin search", add_help=False)
    p.add_argument("--batch-size", default=128, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--accum-iter", default=1, type=int)
    p.add_argument("--model", default="swin_tiny_patch4_window7_224_mim")
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--drop-path", type=float, default=0.1)
    p.add_argument("--blr", type=float, default=2.5e-4)
    p.add_argument("--blr_arch", type=float, default=2.5e-4)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--warmup-lr", type=float, default=1e-6)
    p.add_argument("--min-lr", type=float, default=1e-5)
    p.add_argument("--warmup-epochs", type=int, default=20)
    p.add_argument("--sched", default="cosine", type=str)
    p.add_argument("--weight-decay", type=float, default=1e-3)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--repeated-aug", action="store_true", default=True)
    p.add_argument("--no-repeated-aug", action="store_false",
                   dest="repeated_aug")
    p.add_argument("--data-path", default="", type=str)
    p.add_argument("--data-set", default="IMNET",
                   choices=["CIFAR10", "CIFAR100", "IMNET", "IMNET100",
                            "INAT", "INAT19", "SYNTHETIC", "DIGITS"])
    p.add_argument("--output_dir", default="runs/swin_search")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--w_head", default=0.5, type=float)
    p.add_argument("--w_mlp", default=0.5, type=float)
    p.add_argument("--w_embedding", default=0.5, type=float)
    p.add_argument("--w_flops", default=5, type=float)
    p.add_argument("--target_flops", default=1.0, type=float)
    p.add_argument("--compress-thresh", default=0.2, type=float)
    p.add_argument("--attn_search", action="store_true", default=True)
    p.add_argument("--mlp_search", action="store_true", default=True)
    p.add_argument("--embed_search", action="store_true", default=False)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--eval-every", default=1, type=int)
    p.add_argument("--tiny-test", action="store_true")
    return p


def main(args):
    import jax
    import jax.numpy as jnp
    from ofb_tpu.config import (MixupConfig, OptimFamilyConfig,
                                ScheduleConfig, SearchConfig)
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.core.engine import evaluate, search_one_epoch
    from ofb_tpu.core.optim import build_search_optimizer
    from ofb_tpu.core.steps import TrainState
    from ofb_tpu.core.swin_steps import (make_swin_eval_step,
                                         make_swin_search_step)
    from ofb_tpu.data.datasets import build_dataset
    from ofb_tpu.data.pipeline import device_feed, make_epoch_loader
    from ofb_tpu.models.registry import create_model
    from ofb_tpu.models.swin import SwinCfg
    from ofb_tpu.models.swin_search import (build_swin_space,
                                            export_swin_subnet,
                                            init_swin_search)
    from ofb_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate)
    from ofb_tpu.utils.logging import RunLogger, master_print

    rank, world = jax.process_index(), jax.process_count()
    compute = jnp.bfloat16 if args.compute_dtype == "bfloat16" \
        else jnp.float32

    sched = ScheduleConfig(sched=args.sched, warmup_lr=args.warmup_lr,
                           min_lr=args.min_lr,
                           warmup_epochs=args.warmup_epochs)
    scfg = SearchConfig(
        epochs=args.epochs, accum_iter=args.accum_iter, seed=args.seed,
        output_dir=args.output_dir, w_head=args.w_head, w_mlp=args.w_mlp,
        w_embedding=args.w_embedding, w_flops=args.w_flops,
        target_flops=args.target_flops, compress_thresh=args.compress_thresh,
        optim_param=OptimFamilyConfig(lr=args.lr, blr=args.blr,
                                      weight_decay=args.weight_decay),
        optim_arch=OptimFamilyConfig(lr=args.lr, blr=args.blr_arch,
                                     betas=(0.5, 0.999)),
        optim_decoder=OptimFamilyConfig(lr=args.lr, blr=args.blr),
        schedule=sched,
        mixup=MixupConfig(label_smoothing=args.smoothing),
    ).resolve(world_size=world)
    np.random.seed(scfg.seed + rank)

    staging = 256 if not args.tiny_test else 40
    out_size = args.input_size if not args.tiny_test else 32
    from ofb_tpu.config import DataConfig
    dcfg = DataConfig(data_path=args.data_path, data_set=args.data_set,
                      input_size=out_size, num_workers=args.num_workers,
                      repeated_aug=args.repeated_aug,
                      batch_size=args.batch_size)
    ds_train, nb_classes = build_dataset(True, dcfg, staging)
    ds_val, _ = build_dataset(False, dcfg, staging)

    if args.tiny_test:
        cfg = SwinCfg(img_size=32, patch_size=2, num_classes=nb_classes,
                      embed_dim=24, depths=(1, 1), num_heads=(2, 4),
                      window=4, mlp_ratio=2.0,
                      drop_path_rate=args.drop_path)
        space = build_swin_space(cfg, attn_search=args.attn_search,
                                 mlp_search=args.mlp_search,
                                 embed_search=args.embed_search)
        params, alphas, arch = init_swin_search(
            jax.random.PRNGKey(scfg.seed), cfg, space)
    else:
        bundle = create_model(args.model, num_classes=nb_classes,
                              img_size=args.input_size,
                              attn_search=args.attn_search,
                              mlp_search=args.mlp_search,
                              embed_search=args.embed_search,
                              drop_path_rate=args.drop_path)
        cfg, space = bundle.cfg, bundle.space
        params, alphas, arch = bundle.init(jax.random.PRNGKey(scfg.seed))

    probe = make_epoch_loader(ds_train, epoch=0, rank=rank, world=world,
                              batch_size=args.batch_size * args.accum_iter,
                              repeated_aug=args.repeated_aug, train=True,
                              seed=scfg.seed)
    steps_per_epoch = len(probe)
    total_micro = scfg.epochs * steps_per_epoch * scfg.accum_iter
    master_print(f"swin search: steps/epoch {steps_per_epoch} "
                 f"(accum {scfg.accum_iter})")

    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=total_micro,
        steps_per_epoch=steps_per_epoch * scfg.accum_iter,
        accum_iter=scfg.accum_iter)

    mesh = make_mesh()
    params = replicate(mesh, params)
    alphas = replicate(mesh, alphas)
    arch = replicate(mesh, arch)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))

    sstep = make_swin_search_step(space, cfg, scfg, tx, phase="search",
                                  compute_dtype=compute, donate=False)
    pstep = make_swin_search_step(space, cfg, scfg, tx, phase="postsearch",
                                  compute_dtype=compute, donate=False)
    eval_step = make_swin_eval_step(space, cfg, compute_dtype=compute)
    logger = RunLogger(scfg.output_dir)
    bsh = batch_sharding(mesh, leading_accum=True)
    rng = jax.random.PRNGKey(scfg.seed + 1234)
    finish_search = arch.all_finished
    max_acc = 0.0
    t0 = time.time()

    for epoch in range(scfg.epochs):
        step_fn = pstep if finish_search else sstep
        wrapped = lambda s, i, l, r, k, _f=step_fn: _f(s, i, l, r)
        loader = make_epoch_loader(
            ds_train, epoch=epoch, rank=rank, world=world,
            batch_size=args.batch_size * scfg.accum_iter,
            repeated_aug=args.repeated_aug, train=True, seed=scfg.seed,
            num_workers=args.num_workers if not args.tiny_test else 0)
        rng, frng, erng = jax.random.split(rng, 3)
        feed = device_feed(loader, rng=frng, train=True,
                           accum_iter=scfg.accum_iter, out_size=out_size,
                           use_randaug=bool(args.aa), re_prob=args.reprob,
                           batch_sharding=bsh)
        state, stats, finish_search, pruned = search_one_epoch(
            state, wrapped, feed, epoch=epoch,
            steps_per_epoch=steps_per_epoch, scfg=scfg, space=space,
            rng=erng, finish_search=finish_search)

        if scfg.output_dir:
            ckpt.save_checkpoint(
                os.path.join(scfg.output_dir, "running_ckpt"),
                params=state.params, alphas=state.alphas, arch=state.arch,
                opt_state=state.opt_state,
                meta={"epoch": epoch, "finish_search": bool(finish_search),
                      "family": "swin"}, async_write=True)

        if epoch % args.eval_every == 0 or epoch == scfg.epochs - 1:
            vloader = make_epoch_loader(ds_val, epoch=0, rank=rank,
                                        world=world,
                                        batch_size=args.batch_size,
                                        repeated_aug=False, train=False,
                                        seed=scfg.seed)
            vfeed = device_feed(vloader, rng=jax.random.PRNGKey(0),
                                train=False, accum_iter=1,
                                out_size=out_size, batch_sharding=None)
            test_stats = evaluate(eval_step, vfeed, state.params,
                                  state.alphas, state.arch)
            if test_stats["acc1"] >= max_acc and scfg.output_dir:
                ckpt.save_checkpoint(
                    os.path.join(scfg.output_dir, "best"),
                    params=state.params, alphas=state.alphas,
                    arch=state.arch,
                    meta={"epoch": epoch, "acc1": test_stats["acc1"],
                          "finish_search": bool(finish_search),
                          "family": "swin"})
            max_acc = max(max_acc, test_stats["acc1"])
            logger.log_epoch(epoch, stats, test_stats, 0, 0.0)

    if finish_search and scfg.output_dir:
        dense, dcfg_out, meta = export_swin_subnet(
            jax.device_get(state.params),
            jax.tree_util.tree_map(jax.device_get, state.arch), space, cfg)
        ckpt.save_checkpoint(os.path.join(scfg.output_dir, "model_exported"),
                             params=dense,
                             meta={"exported": True, "family": "swin",
                                   **meta})
        master_print("saved model_exported (sliced Swin subnet)")

    ckpt.wait_for_pending_saves()
    master_print(f"Swin search time "
                 f"{time.strftime('%H:%M:%S', time.gmtime(time.time() - t0))}")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser("OFB TPU Swin search",
                                     parents=[get_args_parser()])
    main(parser.parse_args())
