"""OFB search CLI — the reference search.py entry point, TPU-native.

Orchestration (reference search.py:374-792): build data/model/optimizers,
epoch loop of search_one_epoch with the in-loop compress state machine,
post-finish transition (mask ratio -> 1.0, decoder frozen, mixup on,
soft-target CE), per-epoch soft-accuracy eval + checkpoints
(running/best/pruned), alpha + score-map logging, fuse at the end
(or break at --fuse_point for the two-stage shell flow, run_exp.sh:15-17).

Example (synthetic smoke):
  python scripts/search.py --data-set SYNTHETIC --model deit_tiny_test \
      --epochs 2 --batch-size 8 --output_dir runs/smoke
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("OFB TPU searching script", add_help=False)
    p.add_argument("--batch-size", default=128, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--accum-iter", default=2, type=int)
    p.add_argument("--model", default="deit_small_patch16_224_mim", type=str)
    p.add_argument("--mae", action="store_true", default=True)
    p.add_argument("--no-mae", action="store_false", dest="mae")
    p.add_argument("--input-size", default=224, type=int)
    p.add_argument("--mask-ratio", default=1.0, type=float)
    p.add_argument("--fuse_point", default=50, type=int)
    p.add_argument("--drop", type=float, default=0.0)
    p.add_argument("--drop-path", type=float, default=0.1)
    p.add_argument("--model-ema", action="store_true", default=False)
    p.add_argument("--model-ema-decay", type=float, default=0.99996)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint", default="", type=str)
    p.add_argument("--auto-resume", default=2, type=int,
                   help="on a transient relay/transport failure, re-exec "
                        "this CLI with --resume --checkpoint "
                        "<output_dir>/running_ckpt up to N times "
                        "(ofb_tpu/utils/resilience.py); 0 disables")
    # optimizer families (reference search.py:56-98)
    p.add_argument("--opt-eps", default=1e-8, type=float)
    p.add_argument("--opt-betas", default=(0.9, 0.999), type=float, nargs=2)
    p.add_argument("--opt-betas-arch", default=(0.5, 0.999), type=float,
                   nargs=2)
    p.add_argument("--weight-decay", type=float, default=1e-3)
    p.add_argument("--weight-decay-arch", type=float, default=1e-3)
    p.add_argument("--weight-decay-decoder", type=float, default=1e-3)
    p.add_argument("--clip-grad", type=float, default=None)
    p.add_argument("--sched", default="cosine", type=str)
    p.add_argument("--patience-epochs", default=10, type=int,
                   help="plateau scheduler patience (reference "
                        "lr_sched.py:106-121)")
    p.add_argument("--decay-rate", default=0.1, type=float)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--lr_arch", type=float, default=None)
    p.add_argument("--lr_decoder", type=float, default=None)
    p.add_argument("--blr", type=float, default=2.5e-4)
    p.add_argument("--blr_arch", type=float, default=2.5e-4)
    p.add_argument("--blr_decoder", type=float, default=2.5e-4)
    p.add_argument("--warmup-lr", type=float, default=1e-6)
    p.add_argument("--min-lr", type=float, default=1e-5)
    p.add_argument("--min-lr-arch", type=float, default=None,
                   help="LR floor for the ARCH schedule only (absolute; "
                        "param/decoder keep --min-lr). Organic tail fix: "
                        "alpha drift is ~linear in arch LR, so the shared "
                        "cosine decaying to ~0 freezes the last open "
                        "modules just above the kill threshold "
                        "(scripts/alpha_tail.py; BENCH.md round 5); "
                        "~0.15x the peak arch LR keeps the tail killing")
    p.add_argument("--warmup-epochs", type=int, default=20)
    # augmentation (reference search.py:120-156)
    p.add_argument("--color-jitter", type=float, default=0.4)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--repeated-aug", action="store_true", default=True)
    p.add_argument("--no-repeated-aug", action="store_false",
                   dest="repeated_aug")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--synthetic-size", type=int, default=2048,
                   help="samples per epoch when --data-set SYNTHETIC "
                        "(sustained-epoch benchmarking)")
    p.add_argument("--min-crop-scale", type=float, default=0.08,
                   help="RandomResizedCrop scale lower bound (small "
                        "datasets need a gentler crop than ImageNet's .08)")
    p.add_argument("--no-hflip", action="store_false", dest="hflip",
                   default=True)
    p.add_argument("--mixup", type=float, default=0.0)
    p.add_argument("--cutmix", type=float, default=0.0)
    p.add_argument("--cutmix-minmax", type=float, nargs="+",
                   default=None,
                   help="cutmix min/max ratio (overrides alpha; reference search.py:151)")
    p.add_argument("--mixup-prob", type=float, default=1.0)
    p.add_argument("--mixup-switch-prob", type=float, default=0.5)
    p.add_argument("--mixup-mode", type=str, default="batch",
                   choices=["batch", "pair", "elem"])
    # distillation (reference search.py:158-164)
    p.add_argument("--teacher-model", default="regnety_160", type=str)
    p.add_argument("--teacher-path", default="", type=str)
    p.add_argument("--distillation-type", default="none",
                   choices=["none", "soft", "hard"])
    p.add_argument("--distillation-alpha", default=0.5, type=float)
    p.add_argument("--distillation-tau", default=1.0, type=float)
    # data
    p.add_argument("--data-path", default="", type=str)
    p.add_argument("--data-set", default="IMNET",
                   choices=["CIFAR10", "CIFAR100", "IMNET", "IMNET100",
                            "INAT", "INAT19", "SYNTHETIC", "DIGITS"])
    p.add_argument("--output_dir", default="runs/test")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    # search params (reference search.py:199-224)
    p.add_argument("--w_head", default=0.5, type=float)
    p.add_argument("--w_embedding", default=0.5, type=float)
    p.add_argument("--w_mlp", default=0.5, type=float)
    p.add_argument("--w_patch", default=0, type=float)
    p.add_argument("--w_flops", default=5, type=float)
    p.add_argument("--w_decoder", default=1, type=float)
    p.add_argument("--target_flops", default=1.0, type=float)
    p.add_argument("--compress-thresh", default=0.2, type=float,
                   help="cell-kill threshold for the compress state "
                        "machine (reference engine.py:205)")
    p.add_argument("--max_ratio", default=0.95, type=float)
    p.add_argument("--min_ratio", default=0.75, type=float)
    p.add_argument("--pretrained_path", default="", type=str)
    p.add_argument("--head_search", action="store_true")
    p.add_argument("--channel_search", action="store_true")
    p.add_argument("--attn_search", action="store_true", default=True)
    p.add_argument("--mlp_search", action="store_true", default=True)
    p.add_argument("--embed_search", action="store_true", default=True)
    p.add_argument("--patch_search", action="store_true", default=True)
    p.add_argument("--freeze_weights", action="store_true")
    p.add_argument("--no-progressive", action="store_true")
    p.add_argument("--no-entropy", action="store_true")
    p.add_argument("--no-var", action="store_true")
    p.add_argument("--no-norm", action="store_true")
    p.add_argument("--norm_pix_loss", action="store_true", default=True)
    p.add_argument("--vis-score", action="store_true")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--fused-augment", action="store_true", default=True,
                   help="run the train transform inside the train-step jit")
    p.add_argument("--no-fused-augment", action="store_false",
                   dest="fused_augment")
    p.add_argument("--planned-epoch", action="store_true", default=False,
                   help="with --cache-device: upload the epoch index plan "
                        "once and run ONE dispatch per step (in-jit "
                        "w_p/keep anneals, rng, gather, augment, packed "
                        "metrics) — cuts per-step host round-trips on "
                        "relay-attached hosts")
    p.add_argument("--no-planned-epoch", action="store_false",
                   dest="planned_epoch")
    p.add_argument("--cache-device", action="store_true",
                   help="decode the dataset once and keep the uint8 staging "
                        "set in device HBM; epochs gather batches on device "
                        "instead of re-uploading (single-process, datasets "
                        "that fit HBM)")
    p.add_argument("--cache-device-max-gb", default=12.0, type=float,
                   help="refuse the device cache above this decoded size")
    p.add_argument("--eval-every", default=1, type=int)
    p.add_argument("--ckpt-every", default=1, type=int,
                   help="write running_ckpt every N epochs (1 = reference "
                        "parity; final/fuse-point epochs always write)")
    p.add_argument("--tiny-test", action="store_true",
                   help="tiny model/images for smoke tests")
    p.add_argument("--tiny-dims", type=int, nargs=3, default=(32, 2, 2),
                   metavar=("EMBED", "DEPTH", "HEADS"),
                   help="tiny-test model geometry (richer grids expose "
                        "more compression levels on small data)")
    # accepted-for-compatibility flags from the reference CLI (no-ops here:
    # bf16 replaces apex AMP; the mesh replaces torch.distributed)
    p.add_argument("--use-amp", action="store_true",
                   help="[compat] no-op: bf16 compute replaces apex AMP")
    p.add_argument("--device", default="tpu", help="[compat] no-op")
    p.add_argument("--gpu", default="", help="[compat] no-op")
    p.add_argument("--world_size", default=1, type=int,
                   help="[compat] no-op: world size comes from the mesh")
    p.add_argument("--dist_url", default="env://", help="[compat] no-op")
    p.add_argument("--dist-eval", action="store_true", help="[compat] no-op")
    p.add_argument("--pin-mem", action="store_true", help="[compat] no-op")
    p.add_argument("--no-pin-mem", action="store_false", dest="pin_mem",
                   help="[compat] no-op")
    return p


def main(args):
    import jax
    import jax.numpy as jnp
    from ofb_tpu.config import (DataConfig, DistillationConfig, MixupConfig,
                                OptimFamilyConfig, ScheduleConfig,
                                SearchConfig)
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.core.engine import evaluate, search_one_epoch
    from ofb_tpu.core.optim import (PlateauTracker, build_search_optimizer,
                                    make_trainable_mask, set_lr_scale,
                                    with_lr_scale)
    from ofb_tpu.core.steps import (TrainState, make_eval_step,
                                    make_search_step)
    from ofb_tpu.data.datasets import build_dataset
    from ofb_tpu.data.pipeline import (build_device_cache, device_cache_feed,
                                       device_feed, make_epoch_loader)
    from ofb_tpu.models.mim_vit import fuse_params
    from ofb_tpu.models.registry import ModelBundle, create_model
    from ofb_tpu.models.search_space import SearchSpace
    from ofb_tpu.models.vit import ModelCfg
    from ofb_tpu.ops.flops import model_flops, searched_params_count
    from ofb_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from ofb_tpu.utils.logging import RunLogger, master_print

    rank = jax.process_index()
    world = jax.process_count()
    compute = jnp.bfloat16 if args.compute_dtype == "bfloat16" \
        else jnp.float32

    sched = ScheduleConfig(sched=args.sched, warmup_lr=args.warmup_lr,
                           min_lr=args.min_lr,
                           warmup_epochs=args.warmup_epochs,
                           decay_rate=args.decay_rate)
    scfg = SearchConfig(
        model=args.model, epochs=args.epochs, accum_iter=args.accum_iter,
        fuse_point=args.fuse_point, seed=args.seed,
        start_epoch=args.start_epoch, output_dir=args.output_dir,
        drop=args.drop, drop_path=args.drop_path, mask_ratio=args.mask_ratio,
        mae=args.mae, attn_search=args.attn_search,
        mlp_search=args.mlp_search, embed_search=args.embed_search,
        patch_search=args.patch_search, head_search=args.head_search,
        channel_search=args.channel_search,
        freeze_weights=args.freeze_weights,
        w_head=args.w_head, w_mlp=args.w_mlp, w_patch=args.w_patch,
        w_embedding=args.w_embedding, w_flops=args.w_flops,
        w_decoder=args.w_decoder, target_flops=args.target_flops,
        progressive=not args.no_progressive, entropy=not args.no_entropy,
        var=not args.no_var, norm=not args.no_norm,
        max_ratio=args.max_ratio, min_ratio=args.min_ratio,
        optim_param=OptimFamilyConfig(lr=args.lr, blr=args.blr,
                                      eps=args.opt_eps,
                                      betas=tuple(args.opt_betas),
                                      weight_decay=args.weight_decay),
        optim_arch=OptimFamilyConfig(lr=args.lr_arch, blr=args.blr_arch,
                                     eps=args.opt_eps,
                                     betas=tuple(args.opt_betas_arch),
                                     weight_decay=args.weight_decay_arch),
        optim_decoder=OptimFamilyConfig(
            lr=args.lr_decoder, blr=args.blr_decoder, eps=args.opt_eps,
            betas=tuple(args.opt_betas),
            weight_decay=args.weight_decay_decoder),
        compress_thresh=args.compress_thresh,
        clip_grad=args.clip_grad, schedule=sched,
        model_ema=args.model_ema, model_ema_decay=args.model_ema_decay,
        data=DataConfig(data_path=args.data_path, data_set=args.data_set,
                        input_size=args.input_size,
                        num_workers=args.num_workers,
                        repeated_aug=args.repeated_aug,
                        batch_size=args.batch_size,
                        synthetic_size=args.synthetic_size),
        mixup=MixupConfig(mixup=args.mixup, cutmix=args.cutmix,
                          prob=args.mixup_prob,
                          switch_prob=args.mixup_switch_prob,
                      cutmix_minmax=tuple(args.cutmix_minmax)
                      if args.cutmix_minmax else None,
                      mode=args.mixup_mode,
                          label_smoothing=args.smoothing),
        distillation=DistillationConfig(
            teacher_model=args.teacher_model, teacher_path=args.teacher_path,
            distillation_type=args.distillation_type,
            alpha=args.distillation_alpha, tau=args.distillation_tau),
        resume=args.resume, checkpoint=args.checkpoint,
        pretrained_path=args.pretrained_path,
    ).resolve(world_size=world)

    master_print(scfg)
    np.random.seed(scfg.seed + rank)

    staging = 256 if not args.tiny_test else 40
    out_size = scfg.data.input_size if not args.tiny_test else 32
    ds_train, nb_classes = build_dataset(True, scfg.data, staging)
    ds_val, _ = build_dataset(False, scfg.data, staging)

    # optional device-resident uint8 cache (one decode+upload, then every
    # epoch gathers at HBM bandwidth — see data/pipeline.py)
    cache_train = cache_val = None
    if args.cache_device:
        if world > 1:
            master_print("--cache-device is single-process only; "
                         "falling back to the host loader")
        else:
            t0 = time.time()
            max_bytes = int(args.cache_device_max_gb * 2**30)
            cache_train = build_device_cache(ds_train, max_bytes=max_bytes)
            cache_val = build_device_cache(ds_val, max_bytes=max_bytes)
            # force the upload now so step timing excludes it
            float(cache_train[0][-1, 0, 0, 0])
            gb = (cache_train[0].nbytes + cache_val[0].nbytes) / 2**30
            master_print(f"device cache: {gb:.2f} GiB staged+uploaded "
                         f"in {time.time() - t0:.1f}s")

    # model
    if args.tiny_test:
        td, tdep, th = args.tiny_dims
        cfg = ModelCfg(img_size=32, patch_size=8, num_classes=nb_classes,
                       embed_dim=td, depth=tdep, num_heads=th,
                       mlp_ratio=2.0, drop_path_rate=args.drop_path)
        space = SearchSpace.build(td, tdep, th, cfg.hidden, cfg.num_patches,
                                  patch_search=args.patch_search)
        bundle = ModelBundle(name="tiny", cfg=cfg, kind="mim", space=space)
    else:
        bundle = create_model(
            args.model, num_classes=nb_classes, mae=args.mae,
            img_size=args.input_size,
            attn_search=args.attn_search, mlp_search=args.mlp_search,
            embed_search=args.embed_search, patch_search=args.patch_search,
            head_search=args.head_search, channel_search=args.channel_search,
            mask_ratio=args.mask_ratio, drop_rate=args.drop,
            drop_path_rate=args.drop_path)
    cfg, space = bundle.cfg, bundle.space

    key = jax.random.PRNGKey(scfg.seed)
    params, alphas, arch = bundle.init(key)

    if scfg.pretrained_path:
        import torch
        from ofb_tpu.models.torch_import import torch_state_dict_to_params
        sd = torch.load(scfg.pretrained_path, map_location="cpu")
        sd = sd.get("model", sd)
        params = torch_state_dict_to_params(sd, cfg, params)
        master_print(f"loaded pretrained weights from {scfg.pretrained_path}")

    # data plan
    probe = make_epoch_loader(ds_train, epoch=0, rank=rank, world=world,
                              batch_size=scfg.data.batch_size * scfg.accum_iter,
                              repeated_aug=scfg.data.repeated_aug, train=True,
                              seed=scfg.seed)
    steps_per_epoch = len(probe)
    total_micro = scfg.epochs * steps_per_epoch * scfg.accum_iter
    master_print(f"steps/epoch: {steps_per_epoch} (accum {scfg.accum_iter})")

    sched_arch = None
    if args.min_lr_arch is not None:
        import dataclasses as _dc
        sched_arch = _dc.replace(scfg.schedule, min_lr=args.min_lr_arch)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=total_micro,
        steps_per_epoch=steps_per_epoch * scfg.accum_iter,
        clip_grad=scfg.clip_grad, accum_iter=scfg.accum_iter,
        sched_arch=sched_arch)
    # plateau: constant in-graph schedule, host-side tracker writes its
    # scale into the optimizer state after each eval (lr_sched.py:106-121)
    plateau = PlateauTracker(patience=args.patience_epochs,
                             decay_rate=args.decay_rate) \
        if args.sched == "plateau" else None
    if plateau is not None:
        tx = with_lr_scale(tx)

    mesh = make_mesh()
    params = replicate(mesh, params)
    alphas = replicate(mesh, alphas)
    arch = replicate(mesh, arch)
    opt_state = tx.init((params, alphas))
    ema = jax.tree_util.tree_map(lambda x: x.copy(), params) \
        if scfg.model_ema else None
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch, opt_state=opt_state,
                       ema_params=ema)

    finish_search = arch.all_finished
    start_epoch = scfg.start_epoch
    if scfg.resume and scfg.checkpoint:
        restored = ckpt.load_checkpoint(
            scfg.checkpoint, params=state.params, alphas=state.alphas,
            arch=state.arch, opt_state=state.opt_state, ema_params=ema)
        state = state.replace(
            params=restored.get("params", state.params),
            alphas=restored.get("alphas", state.alphas),
            arch=restored.get("arch", state.arch),
            opt_state=restored.get("opt_state", state.opt_state),
            ema_params=restored.get("ema", ema))
        start_epoch = restored["meta"].get("epoch", -1) + 1
        finish_search = state.arch.all_finished
        master_print(f"resumed from {scfg.checkpoint} at epoch {start_epoch}")

    pmask, amask = make_trainable_mask(
        jax.device_get(state.params), jax.device_get(state.alphas),
        freeze_weights=scfg.freeze_weights, w_head=scfg.w_head,
        w_mlp=scfg.w_mlp, w_patch=scfg.w_patch, w_embedding=scfg.w_embedding)

    # teacher model for KD (reference search.py:587-604). The reference's
    # default teacher is timm regnety_160 (a convnet); both RegNetY and any
    # registry ViT/DeiT teacher are supported, loaded from torch checkpoints.
    teacher_apply = None
    if scfg.distillation.distillation_type != "none":
        from ofb_tpu.models.teacher import build_teacher
        teacher_apply = build_teacher(
            scfg.distillation.teacher_model,
            teacher_path=scfg.distillation.teacher_path,
            num_classes=nb_classes, mesh=mesh, compute_dtype=compute)

    def build_step(phase):
        # stage-2 of the two-stage flow trains the *fused* supernet
        # (reference run_exp.sh:17 resumes from model_fused.pth)
        return make_search_step(space, cfg, scfg, tx, phase=phase,
                                param_mask=pmask, alpha_mask=amask,
                                teacher_apply=teacher_apply,
                                compute_dtype=compute, donate=False,
                                fused_augment=args.fused_augment,
                                use_randaug=bool(args.aa),
                                re_prob=args.reprob,
                                crop_scale=(args.min_crop_scale, 1.0),
                                hflip=args.hflip,
                                fused_model=bool(
                                    jax.device_get(state.arch.fused)))

    planned_active = (args.planned_epoch and cache_train is not None
                      and world == 1 and args.fused_augment)

    def build_planned_step(phase):
        from ofb_tpu.core.steps import make_planned_search_step
        return make_planned_search_step(
            space, cfg, scfg, tx, phase=phase,
            steps_per_epoch=steps_per_epoch, param_mask=pmask,
            alpha_mask=amask, teacher_apply=teacher_apply,
            compute_dtype=compute, donate=False,
            use_randaug=bool(args.aa), re_prob=args.reprob,
            crop_scale=(args.min_crop_scale, 1.0), hflip=args.hflip,
            fused_model=bool(jax.device_get(state.arch.fused)))

    step_fn = build_step("postsearch" if finish_search else "search")
    planned_fn = planned_keys = None
    if planned_active:
        planned_fn, planned_keys = build_planned_step(
            "postsearch" if finish_search else "search")
        master_print("planned-epoch loop: one dispatch per step")
    eval_step = make_eval_step(space, cfg, compute_dtype=compute)

    def make_val_feed():
        if cache_val is not None:
            return device_cache_feed(
                *cache_val, rng=jax.random.PRNGKey(0), epoch=0, rank=rank,
                world=world, batch_size=scfg.data.batch_size,
                repeated_aug=False, train=False, seed=scfg.seed,
                accum_iter=1, out_size=out_size, batch_sharding=None)
        vloader = make_epoch_loader(
            ds_val, epoch=0, rank=rank, world=world,
            batch_size=scfg.data.batch_size, repeated_aug=False,
            train=False, seed=scfg.seed)
        return device_feed(vloader, rng=jax.random.PRNGKey(0), train=False,
                           accum_iter=1, out_size=out_size,
                           batch_sharding=None)

    logger = RunLogger(scfg.output_dir)
    bsh = batch_sharding(mesh, leading_accum=True)
    rng = jax.random.PRNGKey(scfg.seed + 1234)
    max_soft_acc = 0.0
    first_finish = not finish_search
    t_start = time.time()
    execute_prune = False
    fused = False

    for epoch in range(start_epoch, scfg.epochs):
        if finish_search and first_finish:
            # post-search transition (reference search.py:641-657)
            first_finish = False
            step_fn = build_step("postsearch")
            if planned_active:
                planned_fn, planned_keys = build_planned_step("postsearch")
            max_soft_acc = 0.0
            master_print("== finish_search: PMIM off, decoder frozen, "
                         "mixup/cutmix on, soft-target CE ==")

        rng, feed_rng, epoch_rng = jax.random.split(rng, 3)
        if planned_active:
            from ofb_tpu.core.engine import search_one_epoch_planned
            from ofb_tpu.data.samplers import (distributed_indices,
                                               epoch_batches, ra_indices)
            n_cache = int(cache_train[0].shape[0])
            if scfg.data.repeated_aug:
                plan_idx = ra_indices(n_cache, epoch, rank, world,
                                      seed=scfg.seed)
            else:
                plan_idx = distributed_indices(n_cache, epoch, rank, world,
                                               shuffle=True, seed=scfg.seed)
            batches = epoch_batches(
                plan_idx, scfg.data.batch_size * scfg.accum_iter,
                drop_last=True)
            was_finished = finish_search
            state, train_stats, finish_search, pruned = \
                search_one_epoch_planned(
                    state, planned_fn, planned_keys, cache_train[0],
                    cache_train[1], batches, epoch=epoch, scfg=scfg,
                    space=space, rng=feed_rng, finish_search=finish_search)
            execute_prune = pruned
            if finish_search and not was_finished:
                first_finish = True
        elif cache_train is not None:
            feed = device_cache_feed(
                *cache_train, rng=feed_rng, epoch=epoch, rank=rank,
                world=world,
                batch_size=scfg.data.batch_size * scfg.accum_iter,
                repeated_aug=scfg.data.repeated_aug, train=True,
                seed=scfg.seed, accum_iter=scfg.accum_iter,
                out_size=out_size, use_randaug=bool(args.aa),
                re_prob=args.reprob,
                crop_scale=(args.min_crop_scale, 1.0), hflip=args.hflip,
                batch_sharding=bsh, raw=args.fused_augment)
        else:
            loader = make_epoch_loader(
                ds_train, epoch=epoch, rank=rank, world=world,
                batch_size=scfg.data.batch_size * scfg.accum_iter,
                repeated_aug=scfg.data.repeated_aug, train=True,
                seed=scfg.seed,
                num_workers=scfg.data.num_workers if not args.tiny_test
                else 0)
            feed = device_feed(loader, rng=feed_rng, train=True,
                               accum_iter=scfg.accum_iter, out_size=out_size,
                               use_randaug=bool(args.aa), re_prob=args.reprob,
                               crop_scale=(args.min_crop_scale, 1.0),
                               hflip=args.hflip,
                               batch_sharding=bsh, raw=args.fused_augment)

        if not planned_active:
            was_finished = finish_search
            state, train_stats, finish_search, pruned = search_one_epoch(
                state, step_fn, feed, epoch=epoch,
                steps_per_epoch=steps_per_epoch, scfg=scfg, space=space,
                rng=epoch_rng, finish_search=finish_search)
            execute_prune = pruned
            if finish_search and not was_finished:
                first_finish = True

        # checkpoints (reference search.py:672-722)
        if scfg.output_dir:
            meta = {"epoch": epoch, "finish_search": bool(finish_search),
                    "args": vars(args)}
            if finish_search and pruned:
                ckpt.save_checkpoint(
                    os.path.join(scfg.output_dir, "model_pruned"),
                    params=state.params, alphas=state.alphas,
                    arch=state.arch, meta=meta)
            # the running checkpoint costs a full host readback of params +
            # opt_state (~0.5 GB for DeiT-S); on a relay-attached host that
            # is seconds per epoch — --ckpt-every thins it (the final epoch
            # and every prune/best checkpoint are always written)
            if epoch % args.ckpt_every == 0 or epoch == scfg.epochs - 1 \
                    or epoch == scfg.fuse_point:
                ckpt.save_checkpoint(
                    os.path.join(scfg.output_dir, "running_ckpt"),
                    params=state.params, alphas=state.alphas, arch=state.arch,
                    opt_state=state.opt_state, ema_params=state.ema_params,
                    meta=meta, async_write=True)
            if args.vis_score and not finish_search:
                logger.save_score_maps(jax.device_get(state.params),
                                       jax.device_get(state.alphas),
                                       state.arch, space)

        # eval (reference search.py:725-740): each host scores its shard
        # of the val split; evaluate() all-reduces the sums across hosts,
        # so test_stats (and the best-checkpoint decision keyed on it) are
        # full-val-set numbers, identical on every process.
        if epoch % args.eval_every == 0 or epoch == scfg.epochs - 1:
            vfeed = make_val_feed()
            test_stats = evaluate(eval_step, vfeed, state.params,
                                  state.alphas, state.arch)
            master_print(f"Soft accuracy: {test_stats['acc1']:.2f}% "
                         f"(max {max(max_soft_acc, test_stats['acc1']):.2f}%)")
            if test_stats["acc1"] >= max_soft_acc and scfg.output_dir:
                # args recorded like the reference pickles args into every
                # checkpoint (search.py:721) — the finetune/export loaders
                # rebuild the supernet template from them
                ckpt.save_checkpoint(
                    os.path.join(scfg.output_dir, "best"),
                    params=state.params, alphas=state.alphas,
                    arch=state.arch, ema_params=state.ema_params,
                    meta={"epoch": epoch, "acc1": test_stats["acc1"],
                          "finish_search": bool(finish_search),
                          "args": vars(args)})
            max_soft_acc = max(max_soft_acc, test_stats["acc1"])
            if plateau is not None:
                scale = plateau.update(test_stats["acc1"])
                state = state.replace(
                    opt_state=set_lr_scale(state.opt_state, scale))

            total_p, searched_p = searched_params_count(
                jax.device_get(state.alphas), state.arch, space, cfg)
            _, gflops = model_flops(jax.device_get(state.alphas), state.arch,
                                    space, cfg)
            logger.log_epoch(epoch, train_stats, test_stats,
                             n_parameters=int(searched_p),
                             n_gflops=float(gflops))
            if not finish_search:
                logger.log_alphas(epoch, jax.device_get(state.alphas))

        # two-stage flow: stop at fuse point (reference search.py:773)
        if epoch == scfg.fuse_point and not fused:
            master_print(f"breaking at fuse_point {scfg.fuse_point}")
            break

    # fuse the BEST checkpoint, evaluate the fused net, save model_fused
    # (reference search.py:775-787 loads best.pth, fuses that, and evals
    # before saving). The reference also guards on `not execute_prune`;
    # fusing from best makes that guard pointless — best exists and holds
    # a clean post-finish state regardless of whether the FINAL epoch
    # contained a prune event — so it is dropped (round-1 VERDICT weak #4).
    if finish_search and not fused:
        bparams = jax.device_get(state.params)
        balphas = jax.device_get(state.alphas)
        barch = jax.tree_util.tree_map(jax.device_get, state.arch)
        best_epoch = -1
        best_dir = os.path.join(scfg.output_dir, "best") \
            if scfg.output_dir else ""
        if best_dir and os.path.exists(os.path.join(best_dir, "meta.json")):
            r = ckpt.load_checkpoint(best_dir, params=bparams,
                                     alphas=balphas, arch=barch)
            if r["meta"].get("finish_search", False):
                bparams, balphas, barch = r["params"], r["alphas"], r["arch"]
                best_epoch = r["meta"].get("epoch", -1)
                master_print(f"fusing best checkpoint (epoch {best_epoch}, "
                             f"acc1 {r['meta'].get('acc1', 0.0):.2f}%)")
            else:
                master_print("best checkpoint predates finish_search; "
                             "fusing final-epoch state instead")
        fparams, farch = fuse_params(bparams, barch, space, cfg)
        fused_eval = make_eval_step(space, cfg, compute_dtype=compute,
                                    fused=True)
        fstats = evaluate(fused_eval, make_val_feed(), fparams, balphas,
                          farch, header="Fused:")
        if scfg.output_dir:
            ckpt.save_checkpoint(
                os.path.join(scfg.output_dir, "model_fused"),
                params=fparams, alphas=balphas, arch=farch,
                meta={"fused": True, "best_epoch": best_epoch,
                      "fused_acc1": fstats["acc1"]})
            master_print("saved model_fused")

    ckpt.wait_for_pending_saves()
    master_print(f"Training time "
                 f"{time.strftime('%H:%M:%S', time.gmtime(time.time() - t_start))}")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser("OFB TPU search",
                                     parents=[get_args_parser()])
    from ofb_tpu.utils.resilience import run_with_auto_resume
    run_with_auto_resume(main, parser.parse_args())
