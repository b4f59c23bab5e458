"""Dense-Swin comparator trainer — the ladder's "dense row".

Trains a stock registry Swin (no search machinery) from scratch with the
SAME supervised recipe as the rung finetunes in scripts/search_swin.py
(cosine AdamW, label smoothing, device-cache planned epochs, best-of
eval snapshots), so runs/ladder_swin_*/dense_ft is an apples-to-apples
capacity reference for the searched subnets (the reference compares its
OFB-Swin points against the stock Swin-T line, reference README.md:27-31).

Usage:
  python scripts/train_swin_dense.py --data-path /tmp/imfolder \
      --data-set IMNET --model swin_tiny_patch4_window7_224 \
      --epochs 40 --batch-size 128 --cache-device --planned-epoch \
      --output_dir runs/ladder_swin_r5/dense_ft
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("dense Swin trainer", add_help=False)
    p.add_argument("--batch-size", default=128, type=int)
    p.add_argument("--epochs", default=40, type=int)
    p.add_argument("--model", default="swin_tiny_patch4_window7_224")
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--drop-path", type=float, default=0.1)
    p.add_argument("--blr", type=float, default=2.5e-4)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--min-crop-scale", type=float, default=0.08)
    p.add_argument("--no-hflip", action="store_false", dest="hflip",
                   default=True)
    p.add_argument("--data-path", default="", type=str)
    p.add_argument("--data-set", default="IMNET",
                   choices=["CIFAR10", "CIFAR100", "IMNET", "IMNET100",
                            "INAT", "INAT19", "SYNTHETIC", "DIGITS"])
    p.add_argument("--output_dir", default="runs/swin_dense")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--eval-every", default=5, type=int)
    p.add_argument("--ckpt-every", default=5, type=int)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint", default="", type=str)
    p.add_argument("--auto-resume", default=2, type=int)
    p.add_argument("--tiny-test", action="store_true")
    p.add_argument("--cache-device", action="store_true")
    p.add_argument("--cache-device-max-gb", default=12.0, type=float)
    p.add_argument("--planned-epoch", action="store_true", default=False)
    return p


def main(args):
    import jax
    import jax.numpy as jnp
    import optax

    import ofb_tpu.core.losses as L
    from ofb_tpu.config import DataConfig, ScheduleConfig
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.core.engine import evaluate
    from ofb_tpu.core.optim import cosine_schedule
    from ofb_tpu.core.steps import TrainState as TS
    from ofb_tpu.core.swin_steps import make_swin_eval_step_dense
    from ofb_tpu.data.datasets import build_dataset
    from ofb_tpu.data.pipeline import (build_device_cache, device_cache_feed,
                                       device_feed, make_epoch_loader)
    from ofb_tpu.models.registry import create_model
    from ofb_tpu.models.swin import SwinCfg, init_swin_params, swin_forward
    from ofb_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from ofb_tpu.utils.logging import master_print

    rank, world = jax.process_index(), jax.process_count()
    compute = jnp.bfloat16 if args.compute_dtype == "bfloat16" \
        else jnp.float32
    t0 = time.time()

    staging = 256 if not args.tiny_test else 40
    out_size = args.input_size if not args.tiny_test else 32
    dcfg = DataConfig(data_path=args.data_path, data_set=args.data_set,
                      input_size=out_size, num_workers=args.num_workers,
                      batch_size=args.batch_size)
    ds_train, nb_classes = build_dataset(True, dcfg, staging)
    ds_val, _ = build_dataset(False, dcfg, staging)

    cache_train = cache_val = None
    if args.cache_device and world == 1:
        max_bytes = int(args.cache_device_max_gb * 2**30)
        cache_train = build_device_cache(ds_train, max_bytes=max_bytes)
        cache_val = build_device_cache(ds_val, max_bytes=max_bytes)
        float(cache_train[0][-1, 0, 0, 0])
        master_print("device cache staged")

    if args.tiny_test:
        cfg = SwinCfg(img_size=32, patch_size=2, num_classes=nb_classes,
                      embed_dim=24, depths=(1, 1), num_heads=(2, 4),
                      window=4, mlp_ratio=2.0,
                      drop_path_rate=args.drop_path)
        params = init_swin_params(jax.random.PRNGKey(args.seed), cfg)
    else:
        bundle = create_model(args.model, num_classes=nb_classes,
                              img_size=args.input_size,
                              drop_path_rate=args.drop_path)
        cfg = bundle.cfg
        params = bundle.init(jax.random.PRNGKey(args.seed))

    probe = make_epoch_loader(ds_train, epoch=0, rank=rank, world=world,
                              batch_size=args.batch_size, repeated_aug=False,
                              train=True, seed=args.seed)
    steps_per_epoch = len(probe)
    master_print(f"dense swin: steps/epoch {steps_per_epoch}")

    # EXACT rung-finetune recipe (scripts/search_swin.py export-finetune):
    # cosine AdamW wd 0.05, blr*batch*world/256, warmup min(5, epochs//4)
    lr = args.blr * args.batch_size * world / 256
    sch = cosine_schedule(
        lr, ScheduleConfig(warmup_lr=1e-6, min_lr=1e-6,
                           warmup_epochs=min(5, args.epochs // 4)),
        args.epochs * steps_per_epoch, steps_per_epoch)
    tx = optax.adamw(sch, weight_decay=0.05)

    mesh = make_mesh()
    opt_state = tx.init(params)
    start_epoch = 0
    best = 0.0
    if args.resume:
        rdir = args.checkpoint or os.path.join(args.output_dir,
                                               "running_ckpt")
        restored = ckpt.load_checkpoint(rdir, params=params,
                                        opt_state=opt_state)
        params = restored.get("params", params)
        opt_state = restored.get("opt_state", opt_state)
        start_epoch = restored["meta"].get("epoch", -1) + 1
        best = float(restored["meta"].get("best_acc1", 0.0))
        master_print(f"resumed from {rdir} at epoch {start_epoch}")
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    state = TS(step=jnp.asarray(start_epoch * steps_per_epoch, jnp.int32),
               params=params, alphas=None, arch=None, opt_state=opt_state)

    eval_step = make_swin_eval_step_dense(cfg, compute_dtype=compute)
    bsh = batch_sharding(mesh, leading_accum=True)

    @jax.jit
    def train_step(st, images, labels, rng):
        def loss_fn(p):
            logits = swin_forward(p, images[0], cfg, train=True, rng=rng,
                                  compute_dtype=compute)
            return L.base_criterion(logits, labels[0], soft_labels=False,
                                    smoothing=args.smoothing)
        loss, g = jax.value_and_grad(loss_fn)(st.params)
        upd, no = tx.update(g, st.opt_state, st.params)
        return st.replace(step=st.step + 1,
                          params=optax.apply_updates(st.params, upd),
                          opt_state=no), {"loss": loss}

    planned_active = args.planned_epoch and cache_train is not None \
        and world == 1
    planned = None
    if planned_active:
        from ofb_tpu.ops.augment import train_augment_batch

        @jax.jit
        def planned(st, cache, idx_plan, labels_plan, epoch_key, epoch_base):
            it = st.step - epoch_base
            idx = jax.lax.dynamic_index_in_dim(idx_plan, it, keepdims=False)
            lbls = jax.lax.dynamic_index_in_dim(labels_plan, it,
                                                keepdims=False)
            imgs = jnp.take(cache, idx, axis=0)
            sub = jax.random.fold_in(epoch_key, it)
            rng_aug, rng_fwd = jax.random.split(sub)
            imgs = train_augment_batch(
                rng_aug, imgs, out_size=out_size, use_randaug=bool(args.aa),
                re_prob=args.reprob,
                crop_scale=(args.min_crop_scale, 1.0), hflip=args.hflip)
            nst, m = train_step(st, imgs[None], lbls[None], rng_fwd)
            return nst, m["loss"]
        master_print("planned-epoch loop: one dispatch per step")

    def val_feed():
        if cache_val is not None:
            return device_cache_feed(
                *cache_val, rng=jax.random.PRNGKey(0), epoch=0, rank=rank,
                world=world, batch_size=args.batch_size, repeated_aug=False,
                train=False, seed=args.seed, accum_iter=1, out_size=out_size)
        vloader = make_epoch_loader(ds_val, epoch=0, rank=rank, world=world,
                                    batch_size=args.batch_size,
                                    repeated_aug=False, train=False,
                                    seed=args.seed)
        return device_feed(vloader, rng=jax.random.PRNGKey(0), train=False,
                           accum_iter=1, out_size=out_size)

    os.makedirs(args.output_dir, exist_ok=True)
    best_params = state.params
    rng = jax.random.PRNGKey(args.seed + 777)
    for ep in range(start_epoch, args.epochs):
        te = time.time()
        rng, a, b = jax.random.split(rng, 3)
        if planned_active:
            from ofb_tpu.core.engine import train_one_epoch_planned
            from ofb_tpu.data.samplers import (distributed_indices,
                                               epoch_batches)
            n_cache = int(cache_train[0].shape[0])
            plan_idx = distributed_indices(n_cache, ep, rank, world,
                                           shuffle=True, seed=args.seed)
            batches = epoch_batches(plan_idx, args.batch_size,
                                    drop_last=True)
            state, _ = train_one_epoch_planned(
                state, planned, cache_train[0], cache_train[1], batches,
                epoch=ep, rng=a)
        else:
            feed = device_feed(
                make_epoch_loader(ds_train, epoch=ep, rank=rank, world=world,
                                  batch_size=args.batch_size,
                                  repeated_aug=False, train=True,
                                  seed=args.seed,
                                  num_workers=args.num_workers),
                rng=a, train=True, accum_iter=1, out_size=out_size,
                use_randaug=bool(args.aa), re_prob=args.reprob,
                crop_scale=(args.min_crop_scale, 1.0), hflip=args.hflip,
                batch_sharding=bsh)
            for images, labels in feed:
                b, sub = jax.random.split(b)
                state, _ = train_step(state, images, labels, sub)
        if ep % max(args.eval_every, 1) == 0 or ep == args.epochs - 1:
            stats = evaluate(eval_step, val_feed(), state.params)
            if stats["acc1"] >= best:
                best = stats["acc1"]
                best_params = state.params
            master_print(f"epoch {ep} acc1 {stats['acc1']:.2f} "
                         f"(best {best:.2f}) {time.time() - te:.1f}s")
        if ep % max(args.ckpt_every, 1) == 0 or ep == args.epochs - 1:
            ckpt.save_checkpoint(
                os.path.join(args.output_dir, "running_ckpt"),
                params=state.params, opt_state=state.opt_state,
                meta={"epoch": ep, "best_acc1": best, "family": "swin",
                      "from_scratch": True,
                      "model_cfg": dataclasses.asdict(cfg)},
                async_write=True)

    ckpt.save_checkpoint(
        os.path.join(args.output_dir, "model_finetuned"),
        params=best_params,
        meta={"exported": True, "family": "swin", "from_scratch": True,
              "acc1": best, "model_cfg": dataclasses.asdict(cfg)})
    ckpt.wait_for_pending_saves()
    master_print(f"dense swin done: best acc1 {best:.2f} in "
                 f"{time.strftime('%H:%M:%S', time.gmtime(time.time() - t0))}")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser("dense Swin trainer",
                                     parents=[get_args_parser()])
    from ofb_tpu.utils.resilience import run_with_auto_resume
    run_with_auto_resume(main, parser.parse_args())
