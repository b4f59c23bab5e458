"""Finetune CLI — train the exported (pruned) subnet to final accuracy.

Reference finetune.py:251-489: load the searched checkpoint via intersect
(here: core/export.py export from the supernet checkpoint, or load an
already-exported dense checkpoint), layer-wise-lr-decay AdamW, 300-epoch
DeiT recipe with mixup/cutmix + EMA.

Example (synthetic smoke):
  python scripts/finetune.py --data-set SYNTHETIC --tiny-test \
      --finetune runs/smoke/best --epochs 2 --batch-size 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def get_args_parser():
    p = argparse.ArgumentParser("OFB TPU finetune script", add_help=False)
    p.add_argument("--batch-size", default=128, type=int)
    p.add_argument("--epochs", default=300, type=int)
    p.add_argument("--accum-iter", default=1, type=int)
    p.add_argument("--model", default="deit_small_patch16_224_finetune")
    p.add_argument("--finetune", default="", type=str,
                   help="searched checkpoint dir (supernet) or exported "
                        "dense checkpoint dir; leave empty ONLY with "
                        "--from-scratch to train the registry model from "
                        "a fresh init (dense comparator)")
    p.add_argument("--from-scratch", action="store_true",
                   help="train the --model registry model from scratch "
                        "under the same recipe (the ladder's dense "
                        "comparator row)")
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--drop", type=float, default=0.0)
    p.add_argument("--drop-path", type=float, default=0.1)
    p.add_argument("--model-ema", action="store_true", default=True)
    p.add_argument("--no-model-ema", action="store_false", dest="model_ema")
    p.add_argument("--model-ema-decay", type=float, default=0.99996)
    p.add_argument("--opt-eps", default=1e-8, type=float)
    p.add_argument("--opt-betas", default=(0.9, 0.999), type=float, nargs=2)
    p.add_argument("--weight-decay", type=float, default=0.05)
    p.add_argument("--layer-decay", type=float, default=0.95)
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--blr", type=float, default=1.5e-4)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--warmup-lr", type=float, default=1e-6)
    p.add_argument("--min-lr", type=float, default=1e-6)
    p.add_argument("--warmup-epochs", type=int, default=5)
    p.add_argument("--sched", default="cosine", type=str)
    p.add_argument("--patience-epochs", default=10, type=int)
    p.add_argument("--decay-rate", default=0.1, type=float)
    p.add_argument("--color-jitter", type=float, default=0.4)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--repeated-aug", action="store_true", default=True)
    p.add_argument("--no-repeated-aug", action="store_false",
                   dest="repeated_aug")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--min-crop-scale", type=float, default=0.08,
                   help="lower bound of the random-resized-crop area")
    p.add_argument("--no-hflip", action="store_false", dest="hflip",
                   default=True, help="disable horizontal flip (digits)")
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--cutmix-minmax", type=float, nargs="+",
                   default=None,
                   help="cutmix min/max ratio (overrides alpha; reference search.py:151)")
    p.add_argument("--mixup-prob", type=float, default=1.0)
    p.add_argument("--mixup-switch-prob", type=float, default=0.5)
    p.add_argument("--mixup-mode", type=str, default="batch",
                   choices=["batch", "pair", "elem"])
    p.add_argument("--teacher-model", default="deit_base_patch16_224")
    p.add_argument("--teacher-path", default="", type=str)
    p.add_argument("--distillation-type", default="none",
                   choices=["none", "soft", "hard"])
    p.add_argument("--distillation-alpha", default=0.5, type=float)
    p.add_argument("--distillation-tau", default=1.0, type=float)
    p.add_argument("--data-path", default="", type=str)
    p.add_argument("--data-set", default="IMNET",
                   choices=["CIFAR10", "CIFAR100", "IMNET", "IMNET100",
                            "INAT", "INAT19", "SYNTHETIC", "DIGITS"])
    p.add_argument("--output_dir", default="runs/finetune")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint", default="", type=str)
    p.add_argument("--auto-resume", default=2, type=int,
                   help="on a transient relay/transport failure, re-exec "
                        "with --resume --checkpoint "
                        "<output_dir>/running_ckpt up to N times; 0 off")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--eval-every", default=1, type=int)
    p.add_argument("--tiny-test", action="store_true")
    p.add_argument("--cache-device", action="store_true",
                   help="keep the decoded uint8 staging set in device HBM "
                        "(see scripts/search.py --cache-device)")
    p.add_argument("--cache-device-max-gb", default=12.0, type=float)
    p.add_argument("--planned-epoch", action="store_true", default=False,
                   help="with --cache-device: one dispatch per step "
                        "(see scripts/search.py --planned-epoch)")
    p.add_argument("--no-planned-epoch", action="store_false",
                   dest="planned_epoch")
    # compat no-ops (see search.py)
    p.add_argument("--use-amp", action="store_true", help="[compat] no-op")
    p.add_argument("--device", default="tpu", help="[compat] no-op")
    p.add_argument("--gpu", default="", help="[compat] no-op")
    p.add_argument("--world_size", default=1, type=int, help="[compat] no-op")
    p.add_argument("--dist_url", default="env://", help="[compat] no-op")
    p.add_argument("--dist-eval", action="store_true", help="[compat] no-op")
    p.add_argument("--pin-mem", action="store_true", help="[compat] no-op")
    return p


def load_searched_model(finetune_dir: str, args, nb_classes: int):
    """Load a searched supernet checkpoint and export the dense subnet
    (the reference's intersect, finetune.py:182-249), or load an
    already-exported dense checkpoint."""
    import jax
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.core.export import export_subnet
    from ofb_tpu.models.registry import create_model
    from ofb_tpu.models.search_space import SearchSpace
    from ofb_tpu.models.vit import ModelCfg

    if not finetune_dir:
        # from-scratch dense comparator: a fresh init of the plain
        # registry model under the SAME finetune recipe (the ladder's
        # dense row; the reference's baselines are the stock FB DeiT
        # training runs this stands in for)
        banner = ("=" * 64 + "\n"
                  "TRAINING DENSE MODEL FROM SCRATCH (no --finetune "
                  "checkpoint)\n" + "=" * 64)
        if not getattr(args, "from_scratch", False):
            banner += ("\nNOTE: pass --from-scratch to make this explicit; "
                       "an empty --finetune without it is usually a "
                       "forgotten flag.")
        print(banner, flush=True)
        if args.tiny_test:
            cfg = ModelCfg(img_size=32, patch_size=8,
                           num_classes=nb_classes, embed_dim=32, depth=2,
                           num_heads=2, mlp_ratio=2.0)
        else:
            cfg = create_model(args.model, num_classes=nb_classes).cfg
        from ofb_tpu.models.vit import init_vit_params
        return init_vit_params(jax.random.PRNGKey(args.seed), cfg), cfg

    meta = ckpt.latest_meta(finetune_dir)
    if meta is None:
        raise FileNotFoundError(f"no checkpoint at {finetune_dir}")
    if meta.get("exported"):
        # dense checkpoint: cfg from meta
        cfg = ckpt.model_cfg_from_meta(meta["model_cfg"], ModelCfg)
        key = jax.random.PRNGKey(0)
        from ofb_tpu.models.vit import init_vit_params
        tpl = init_vit_params(key, cfg)
        restored = ckpt.load_checkpoint(finetune_dir, params=tpl)
        return restored["params"], cfg

    # supernet checkpoint: rebuild the bundle, restore, export
    saved_args = meta.get("args", {})
    model_name = saved_args.get("model", args.model).replace("_finetune",
                                                             "_mim")
    if saved_args.get("tiny_test") or args.tiny_test:
        td, tdep, th = saved_args.get("tiny_dims", (32, 2, 2))
        cfg = ModelCfg(img_size=32, patch_size=8, num_classes=nb_classes,
                       embed_dim=td, depth=tdep, num_heads=th,
                       mlp_ratio=2.0)
        space = SearchSpace.build(td, tdep, th, cfg.hidden, cfg.num_patches,
                                  patch_search=True)
        from ofb_tpu.models.registry import ModelBundle
        bundle = ModelBundle(name="tiny", cfg=cfg, kind="mim", space=space)
    else:
        bundle = create_model(model_name, num_classes=nb_classes)
    key = jax.random.PRNGKey(0)
    params, alphas, arch = bundle.init(key)
    restored = ckpt.load_checkpoint(finetune_dir, params=params,
                                    alphas=alphas, arch=arch)
    params = restored["params"]
    alphas = restored.get("alphas", alphas)
    arch = restored.get("arch", arch)
    # force-finish an unconverged search like the reference
    # (finetune.py:199-201: pretrained_model.compress(1.0) before intersect)
    from ofb_tpu.core.compress import compress as run_compress
    guard = 0
    while not arch.all_finished and guard < 20:
        params, alphas, arch, _, _ = run_compress(params, alphas, arch, None,
                                                  bundle.space, thresh=1.0)
        guard += 1
    dense, dense_cfg, _ = export_subnet(params, arch, bundle.space,
                                        bundle.cfg, fuse=True)
    return dense, dense_cfg


def main(args):
    import dataclasses
    import jax
    import jax.numpy as jnp
    from ofb_tpu.config import DistillationConfig, MixupConfig
    from ofb_tpu.config import ScheduleConfig
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.core.engine import evaluate, train_one_epoch
    from ofb_tpu.core.lr_decay import build_finetune_optimizer
    from ofb_tpu.core.optim import (PlateauTracker, make_schedule,
                                    set_lr_scale, with_lr_scale)
    from ofb_tpu.core.steps import (TrainState, make_eval_step_dense,
                                    make_train_step)
    from ofb_tpu.config import DataConfig
    from ofb_tpu.data.datasets import build_dataset
    from ofb_tpu.data.pipeline import (build_device_cache, device_cache_feed,
                                       device_feed, make_epoch_loader)
    from ofb_tpu.models.pos_embed import interpolate_pos_embed
    from ofb_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from ofb_tpu.utils.logging import RunLogger, master_print

    rank, world = jax.process_index(), jax.process_count()
    compute = jnp.bfloat16 if args.compute_dtype == "bfloat16" \
        else jnp.float32
    dcfg = DataConfig(data_path=args.data_path, data_set=args.data_set,
                      input_size=args.input_size,
                      num_workers=args.num_workers,
                      repeated_aug=args.repeated_aug,
                      batch_size=args.batch_size)
    staging = 256 if not args.tiny_test else 40
    out_size = args.input_size if not args.tiny_test else 32
    ds_train, nb_classes = build_dataset(True, dcfg, staging)
    ds_val, _ = build_dataset(False, dcfg, staging)

    # optional device-resident uint8 cache (see data/pipeline.py; same
    # contract as scripts/search.py --cache-device)
    cache_train = cache_val = None
    if args.cache_device:
        if world > 1:
            master_print("--cache-device is single-process only; "
                         "falling back to the host loader")
        else:
            max_bytes = int(args.cache_device_max_gb * 2**30)
            cache_train = build_device_cache(ds_train, max_bytes=max_bytes)
            cache_val = build_device_cache(ds_val, max_bytes=max_bytes)
            float(cache_train[0][-1, 0, 0, 0])
            master_print("device cache staged")

    params, cfg = load_searched_model(args.finetune, args, nb_classes)
    cfg = dataclasses.replace(cfg, num_classes=nb_classes,
                              drop_path_rate=args.drop_path,
                              drop_rate=args.drop)
    # pos-embed interpolation if input size changed
    # (reference finetune.py:331-349)
    want_tokens = cfg.num_patches + cfg.num_tokens
    if params["pos_embed"].shape[1] != want_tokens:
        params["pos_embed"] = interpolate_pos_embed(
            params["pos_embed"], cfg.num_patches, cfg.num_tokens)

    eff_batch = args.batch_size * args.accum_iter * world
    lr = args.lr if args.lr is not None else args.blr * eff_batch / 256
    master_print(f"finetune lr {lr:.2e} (eff batch {eff_batch}) "
                 f"model dims: D={cfg.embed_dim} blocks={cfg.block_overrides}")

    probe = make_epoch_loader(ds_train, epoch=0, rank=rank, world=world,
                              batch_size=args.batch_size * args.accum_iter,
                              repeated_aug=args.repeated_aug, train=True,
                              seed=args.seed)
    steps_per_epoch = len(probe)
    total_micro = args.epochs * steps_per_epoch * args.accum_iter
    sched_cfg = ScheduleConfig(sched=args.sched, warmup_lr=args.warmup_lr,
                               min_lr=args.min_lr,
                               warmup_epochs=args.warmup_epochs,
                               decay_rate=args.decay_rate)
    schedule = make_schedule(lr, sched_cfg, total_micro,
                             steps_per_epoch * args.accum_iter)
    tx = build_finetune_optimizer(
        params, lr_schedule=lambda c: schedule(c * args.accum_iter),
        betas=tuple(args.opt_betas), eps=args.opt_eps,
        weight_decay=args.weight_decay, layer_decay=args.layer_decay,
        num_layers=cfg.depth, clip_grad=args.clip_grad)
    plateau = PlateauTracker(patience=args.patience_epochs,
                             decay_rate=args.decay_rate) \
        if args.sched == "plateau" else None
    if plateau is not None:
        tx = with_lr_scale(tx)

    mesh = make_mesh()
    params = replicate(mesh, params)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(lambda x: x.copy(), params) \
        if args.model_ema else None
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=None, arch=None, opt_state=opt_state,
                       ema_params=ema)
    start_epoch = args.start_epoch
    if args.resume and args.checkpoint:
        restored = ckpt.load_checkpoint(args.checkpoint, params=params,
                                        opt_state=opt_state, ema_params=ema)
        state = state.replace(
            params=restored.get("params", params),
            opt_state=restored.get("opt_state", opt_state),
            ema_params=restored.get("ema", ema))
        start_epoch = restored["meta"].get("epoch", -1) + 1

    mix = MixupConfig(mixup=args.mixup, cutmix=args.cutmix,
                      prob=args.mixup_prob,
                      switch_prob=args.mixup_switch_prob,
                      cutmix_minmax=tuple(args.cutmix_minmax)
                      if args.cutmix_minmax else None,
                      mode=args.mixup_mode,
                      label_smoothing=args.smoothing)
    teacher_apply = None
    distill = DistillationConfig(distillation_type=args.distillation_type,
                                 alpha=args.distillation_alpha,
                                 tau=args.distillation_tau)
    if args.distillation_type != "none":
        from ofb_tpu.models.teacher import build_teacher
        teacher_apply = build_teacher(
            getattr(args, "teacher_model", "regnety_160"),
            teacher_path=getattr(args, "teacher_path", ""),
            num_classes=nb_classes, mesh=mesh, compute_dtype=compute)

    planned_active = (args.planned_epoch and cache_train is not None
                      and world == 1)
    step_fn = make_train_step(cfg, tx, num_classes=nb_classes,
                              mixup_cfg=mix, smoothing=args.smoothing,
                              ema_decay=args.model_ema_decay
                              if args.model_ema else None,
                              teacher_apply=teacher_apply, distill=distill,
                              compute_dtype=compute, donate=False)
    planned_fn = None
    if planned_active:
        from ofb_tpu.core.steps import make_planned_train_step
        planned_fn = make_planned_train_step(
            cfg, tx, num_classes=nb_classes, accum_iter=args.accum_iter,
            mixup_cfg=mix, smoothing=args.smoothing,
            ema_decay=args.model_ema_decay if args.model_ema else None,
            teacher_apply=teacher_apply, distill=distill,
            compute_dtype=compute, donate=False,
            use_randaug=bool(args.aa), re_prob=args.reprob,
            crop_scale=(args.min_crop_scale, 1.0), hflip=args.hflip)
        master_print("planned-epoch loop: one dispatch per step")
    eval_step = make_eval_step_dense(cfg, compute_dtype=compute)
    logger = RunLogger(args.output_dir)
    bsh = batch_sharding(mesh, leading_accum=True)
    rng = jax.random.PRNGKey(args.seed + 4321)
    max_acc = 0.0
    t0 = time.time()

    for epoch in range(start_epoch, args.epochs):
        rng, frng, erng = jax.random.split(rng, 3)
        if planned_active:
            from ofb_tpu.core.engine import train_one_epoch_planned
            from ofb_tpu.data.samplers import (distributed_indices,
                                               epoch_batches, ra_indices)
            n_cache = int(cache_train[0].shape[0])
            if args.repeated_aug:
                plan_idx = ra_indices(n_cache, epoch, rank, world,
                                      seed=args.seed)
            else:
                plan_idx = distributed_indices(n_cache, epoch, rank, world,
                                               shuffle=True, seed=args.seed)
            batches = epoch_batches(plan_idx,
                                    args.batch_size * args.accum_iter,
                                    drop_last=True)
            state, train_stats = train_one_epoch_planned(
                state, planned_fn, cache_train[0], cache_train[1], batches,
                epoch=epoch, rng=frng)
        elif cache_train is not None:
            feed = device_cache_feed(
                *cache_train, rng=frng, epoch=epoch, rank=rank, world=world,
                batch_size=args.batch_size * args.accum_iter,
                repeated_aug=args.repeated_aug, train=True, seed=args.seed,
                accum_iter=args.accum_iter, out_size=out_size,
                use_randaug=bool(args.aa), re_prob=args.reprob,
                crop_scale=(args.min_crop_scale, 1.0), hflip=args.hflip,
                batch_sharding=bsh)
        else:
            loader = make_epoch_loader(
                ds_train, epoch=epoch, rank=rank, world=world,
                batch_size=args.batch_size * args.accum_iter,
                repeated_aug=args.repeated_aug, train=True, seed=args.seed,
                num_workers=args.num_workers if not args.tiny_test else 0)
            feed = device_feed(loader, rng=frng, train=True,
                               accum_iter=args.accum_iter, out_size=out_size,
                               use_randaug=bool(args.aa), re_prob=args.reprob,
                               crop_scale=(args.min_crop_scale, 1.0),
                               hflip=args.hflip, batch_sharding=bsh)
        if not planned_active:
            state, train_stats = train_one_epoch(
                state, step_fn, feed, epoch=epoch,
                steps_per_epoch=steps_per_epoch, rng=erng)

        if args.output_dir:
            ckpt.save_checkpoint(
                os.path.join(args.output_dir, "running_ckpt"),
                params=state.params, opt_state=state.opt_state,
                ema_params=state.ema_params,
                meta={"epoch": epoch, "exported": True,
                      "from_scratch": not bool(args.finetune),
                      "model_cfg": _cfg_meta(cfg)})

        if epoch % args.eval_every == 0 or epoch == args.epochs - 1:

            def run_eval(eval_params, header="Test:"):
                if cache_val is not None:
                    vfeed = device_cache_feed(
                        *cache_val, rng=jax.random.PRNGKey(0), epoch=0,
                        rank=rank, world=world, batch_size=args.batch_size,
                        repeated_aug=False, train=False, seed=args.seed,
                        accum_iter=1, out_size=out_size)
                else:
                    vloader = make_epoch_loader(ds_val, epoch=0, rank=rank,
                                                world=world,
                                                batch_size=args.batch_size,
                                                repeated_aug=False,
                                                train=False, seed=args.seed)
                    vfeed = device_feed(vloader, rng=jax.random.PRNGKey(0),
                                        train=False, accum_iter=1,
                                        out_size=out_size)
                return evaluate(eval_step, vfeed, eval_params, header=header)

            # evaluate raw AND EMA weights, keep the better (the DeiT
            # recipe tracks ModelEma through training and selects best-of;
            # reference utils.py:332-447, finetune.py:461-476)
            # labeled eval rows: two bare `Test:` lines with different
            # numbers (raw vs EMA weights) are a log-forensics trap
            test_stats = run_eval(state.params, header="Test[raw]:")
            candidates = [("raw", test_stats["acc1"])]
            if state.ema_params is not None:
                ema_stats = run_eval(state.ema_params, header="Test[ema]:")
                candidates.append(("ema", ema_stats["acc1"]))
                test_stats["ema_acc1"] = ema_stats["acc1"]
                master_print(f"EMA accuracy: {ema_stats['acc1']:.2f}%")
            win_kind, win_acc = max(candidates, key=lambda kv: kv[1])
            if win_acc >= max_acc and args.output_dir:
                # store the WINNER's weights as 'params' — consumers load
                # only that part, so it must be the weights that achieved
                # the recorded acc1 (raw kept alongside as 'ema' slot swap)
                win_params = state.ema_params if win_kind == "ema" \
                    else state.params
                # the loser goes in the 'ema' slot so BOTH weight sets
                # survive in the checkpoint (raw kept when EMA wins)
                other_params = state.params if win_kind == "ema" \
                    else state.ema_params
                ckpt.save_checkpoint(
                    os.path.join(args.output_dir, "best"),
                    params=win_params, ema_params=other_params,
                    meta={"epoch": epoch, "acc1": win_acc,
                          "eval_winner": win_kind,
                          "from_scratch": not bool(args.finetune),
                          "exported": True, "model_cfg": _cfg_meta(cfg)})
            max_acc = max(max_acc, win_acc)
            master_print(f"Max accuracy: {max_acc:.2f}%")
            if plateau is not None:
                scale = plateau.update(win_acc)
                state = state.replace(
                    opt_state=set_lr_scale(state.opt_state, scale))
            # live param count + model GFLOPs per epoch like the reference
            # (finetune.py:477-484 logs n_parameters; static here)
            n_params = sum(int(x.size) for x in
                           jax.tree_util.tree_leaves(state.params))
            from ofb_tpu.models.vit import dense_flops
            logger.log_epoch(epoch, train_stats, test_stats, n_params,
                             dense_flops(cfg))

    master_print(f"Finetune time "
                 f"{time.strftime('%H:%M:%S', time.gmtime(time.time() - t0))}")
    return state


def _cfg_meta(cfg):
    import dataclasses
    d = dataclasses.asdict(cfg)
    return d


if __name__ == "__main__":
    parser = argparse.ArgumentParser("OFB TPU finetune",
                                     parents=[get_args_parser()])
    from ofb_tpu.utils.resilience import run_with_auto_resume
    run_with_auto_resume(main, parser.parse_args())
