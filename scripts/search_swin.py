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
    p.add_argument("--min-lr-arch", type=float, default=None,
                   help="LR floor for the ARCH schedule only (see "
                        "scripts/search.py --min-lr-arch)")
    p.add_argument("--warmup-epochs", type=int, default=20)
    p.add_argument("--sched", default="cosine", type=str)
    p.add_argument("--weight-decay", type=float, default=1e-3)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--min-crop-scale", type=float, default=0.08)
    p.add_argument("--no-hflip", action="store_false", dest="hflip",
                   default=True)
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
    p.add_argument("--no-attn_search", action="store_false",
                   dest="attn_search")
    p.add_argument("--mlp_search", action="store_true", default=True)
    p.add_argument("--no-mlp_search", action="store_false",
                   dest="mlp_search")
    p.add_argument("--embed_search", action="store_true", default=False)
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--eval-every", default=1, type=int)
    p.add_argument("--ckpt-every", default=5, type=int,
                   help="write running_ckpt every N epochs (final epoch "
                        "always written). The save serializes ~0.3 GB on "
                        "a background thread; default 5 keeps the GIL "
                        "mostly free for the dispatch loop at a 5-epoch "
                        "resume granularity")
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint (default "
                        "<output_dir>/running_ckpt)")
    p.add_argument("--checkpoint", default="", type=str)
    p.add_argument("--auto-resume", default=2, type=int,
                   help="on a transient relay/transport failure, re-exec "
                        "with --resume --checkpoint "
                        "<output_dir>/running_ckpt up to N times; 0 off")
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
    p.add_argument("--force-finish", action="store_true",
                   help="if the search has not converged by the last epoch, "
                        "force every module to its argmax cell (the "
                        "reference's compress(1.0) pre-export, "
                        "finetune.py:199-201) so the subnet exports")
    p.add_argument("--export-finetune-epochs", default=0, type=int,
                   help="finetune the exported (sliced) subnet for N epochs "
                        "to recover the hard-pruning drop (the reference's "
                        "finetune stage, run_exp.sh:22)")
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
    from ofb_tpu.data.pipeline import (build_device_cache, device_cache_feed,
                                       device_feed, make_epoch_loader)
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

    sched_arch = None
    if args.min_lr_arch is not None:
        import dataclasses as _dc
        sched_arch = _dc.replace(scfg.schedule, min_lr=args.min_lr_arch)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=total_micro,
        steps_per_epoch=steps_per_epoch * scfg.accum_iter,
        accum_iter=scfg.accum_iter, sched_arch=sched_arch)

    mesh = make_mesh()
    start_epoch = 0
    opt_state = tx.init((params, alphas))
    if args.resume:
        rdir = args.checkpoint or os.path.join(scfg.output_dir,
                                               "running_ckpt")
        restored = ckpt.load_checkpoint(rdir, params=params, alphas=alphas,
                                        arch=arch, opt_state=opt_state)
        params = restored.get("params", params)
        alphas = restored.get("alphas", alphas)
        arch = restored.get("arch", arch)
        opt_state = restored.get("opt_state", opt_state)
        start_epoch = restored["meta"].get("epoch", -1) + 1
        master_print(f"resumed from {rdir} at epoch {start_epoch}")
        # restore the best-so-far so the first post-resume eval cannot
        # clobber 'best' with worse weights
        bmeta = ckpt.latest_meta(os.path.join(scfg.output_dir, "best")) \
            if scfg.output_dir else None
        if bmeta and "acc1" in bmeta:
            resumed_best = float(bmeta["acc1"])
        else:
            resumed_best = 0.0
    else:
        resumed_best = 0.0
    params = replicate(mesh, params)
    alphas = replicate(mesh, alphas)
    arch = replicate(mesh, arch)
    opt_state = replicate(mesh, opt_state)
    state = TrainState(
        step=jnp.asarray(start_epoch * steps_per_epoch * scfg.accum_iter,
                         jnp.int32),
        params=params, alphas=alphas, arch=arch, opt_state=opt_state)

    sstep = make_swin_search_step(space, cfg, scfg, tx, phase="search",
                                  compute_dtype=compute, donate=False)
    pstep = make_swin_search_step(space, cfg, scfg, tx, phase="postsearch",
                                  compute_dtype=compute, donate=False)
    planned_active = (args.planned_epoch and cache_train is not None
                      and world == 1)
    if planned_active:
        from ofb_tpu.core.swin_steps import make_planned_swin_search_step
        _pl = dict(steps_per_epoch=steps_per_epoch, compute_dtype=compute,
                   donate=False, use_randaug=bool(args.aa),
                   re_prob=args.reprob,
                   crop_scale=(args.min_crop_scale, 1.0), hflip=args.hflip)
        sstep_pl = make_planned_swin_search_step(space, cfg, scfg, tx,
                                                 phase="search", **_pl)
        pstep_pl = make_planned_swin_search_step(space, cfg, scfg, tx,
                                                 phase="postsearch", **_pl)
        master_print("planned-epoch loop: one dispatch per step")
    eval_step = make_swin_eval_step(space, cfg, compute_dtype=compute)
    logger = RunLogger(scfg.output_dir)
    bsh = batch_sharding(mesh, leading_accum=True)

    def train_feed(epoch, frng, *, batch, ra, accum):
        if cache_train is not None:
            return device_cache_feed(
                *cache_train, rng=frng, epoch=epoch, rank=rank, world=world,
                batch_size=batch, repeated_aug=ra, train=True,
                seed=scfg.seed, accum_iter=accum, out_size=out_size,
                use_randaug=bool(args.aa), re_prob=args.reprob,
                crop_scale=(args.min_crop_scale, 1.0), hflip=args.hflip,
                batch_sharding=bsh)
        loader = make_epoch_loader(
            ds_train, epoch=epoch, rank=rank, world=world, batch_size=batch,
            repeated_aug=ra, train=True, seed=scfg.seed,
            num_workers=args.num_workers if not args.tiny_test else 0)
        return device_feed(loader, rng=frng, train=True, accum_iter=accum,
                           out_size=out_size, use_randaug=bool(args.aa),
                           re_prob=args.reprob,
                           crop_scale=(args.min_crop_scale, 1.0),
                           hflip=args.hflip, batch_sharding=bsh)

    def val_feed():
        if cache_val is not None:
            return device_cache_feed(
                *cache_val, rng=jax.random.PRNGKey(0), epoch=0, rank=rank,
                world=world, batch_size=args.batch_size, repeated_aug=False,
                train=False, seed=scfg.seed, accum_iter=1, out_size=out_size)
        vloader = make_epoch_loader(ds_val, epoch=0, rank=rank, world=world,
                                    batch_size=args.batch_size,
                                    repeated_aug=False, train=False,
                                    seed=scfg.seed)
        return device_feed(vloader, rng=jax.random.PRNGKey(0), train=False,
                           accum_iter=1, out_size=out_size,
                           batch_sharding=None)
    rng = jax.random.PRNGKey(scfg.seed + 1234)
    finish_search = arch.all_finished
    max_acc = resumed_best
    t0 = time.time()

    for epoch in range(start_epoch, scfg.epochs):
        rng, frng, erng = jax.random.split(rng, 3)
        if planned_active:
            from ofb_tpu.core.engine import search_one_epoch_planned
            from ofb_tpu.data.samplers import (distributed_indices,
                                               epoch_batches, ra_indices)
            pfn, pkeys = (pstep_pl if finish_search else sstep_pl)
            n_cache = int(cache_train[0].shape[0])
            if args.repeated_aug:
                plan_idx = ra_indices(n_cache, epoch, rank, world,
                                      seed=scfg.seed)
            else:
                plan_idx = distributed_indices(n_cache, epoch, rank, world,
                                               shuffle=True, seed=scfg.seed)
            batches = epoch_batches(
                plan_idx, args.batch_size * scfg.accum_iter, drop_last=True)
            state, stats, finish_search, pruned = search_one_epoch_planned(
                state, pfn, pkeys, cache_train[0], cache_train[1], batches,
                epoch=epoch, scfg=scfg, space=space, rng=frng,
                finish_search=finish_search)
        else:
            step_fn = pstep if finish_search else sstep
            wrapped = lambda s, i, l, r, k, _f=step_fn: _f(s, i, l, r)
            feed = train_feed(epoch, frng,
                              batch=args.batch_size * scfg.accum_iter,
                              ra=args.repeated_aug, accum=scfg.accum_iter)
            state, stats, finish_search, pruned = search_one_epoch(
                state, wrapped, feed, epoch=epoch,
                steps_per_epoch=steps_per_epoch, scfg=scfg, space=space,
                rng=erng, finish_search=finish_search)

        if scfg.output_dir and (epoch % max(args.ckpt_every, 1) == 0
                                or epoch == scfg.epochs - 1 or pruned):
            ckpt.save_checkpoint(
                os.path.join(scfg.output_dir, "running_ckpt"),
                params=state.params, alphas=state.alphas, arch=state.arch,
                opt_state=state.opt_state,
                meta={"epoch": epoch, "finish_search": bool(finish_search),
                      "family": "swin"}, async_write=True)

        if epoch % args.eval_every == 0 or epoch == scfg.epochs - 1:
            test_stats = evaluate(eval_step, val_feed(), state.params,
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

    if not finish_search and args.force_finish:
        # export from the BEST checkpoint, not the final epoch: late-stage
        # arch-loss pressure degrades the classifier (fuse-at-best parity,
        # reference search.py:775-787)
        best_dir = os.path.join(scfg.output_dir, "best") \
            if scfg.output_dir else None
        if best_dir and os.path.exists(os.path.join(best_dir, "meta.json")):
            restored = ckpt.load_checkpoint(
                best_dir, params=state.params, alphas=state.alphas,
                arch=state.arch)
            state = state.replace(params=restored["params"],
                                  alphas=restored["alphas"],
                                  arch=restored["arch"])
            master_print(f"export from best (epoch "
                         f"{restored['meta'].get('epoch')}, acc1 "
                         f"{restored['meta'].get('acc1'):.2f}%)")
        # repeated compress(1.0) passes until convergence, like the ViT
        # export path (scripts/export.py; reference finetune.py:199-201)
        from ofb_tpu.core.compress import compress
        p2 = jax.device_get(state.params)
        a2 = jax.device_get(state.alphas)
        ar2 = jax.tree_util.tree_map(jax.device_get, state.arch)
        guard = 0
        while not ar2.all_finished and guard < 20:
            p2, a2, ar2, _, rep = compress(p2, a2, ar2, None, space,
                                           thresh=1.0)
            guard += 1
            master_print("force-finish:",
                         "; ".join(rep.events) or "(no event)")
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, p2),
            alphas=jax.tree_util.tree_map(jnp.asarray, a2), arch=ar2)
        finish_search = bool(ar2.all_finished)

    if finish_search and scfg.output_dir:
        dense, dcfg_out, meta = export_swin_subnet(
            jax.device_get(state.params),
            jax.tree_util.tree_map(jax.device_get, state.arch), space, cfg)

        # evaluate the sliced subnet (plain swin_forward, no gates) — the
        # gated==sliced invariant means this should match the supernet
        from ofb_tpu.core.swin_steps import make_swin_eval_step_dense
        dense_eval = make_swin_eval_step_dense(dcfg_out,
                                               compute_dtype=compute)

        exp_stats = evaluate(dense_eval, val_feed(), dense)
        master_print(f"exported subnet acc1 {exp_stats['acc1']:.2f}% "
                     f"(supernet best {max_acc:.2f}%)")
        import dataclasses
        ckpt.save_checkpoint(os.path.join(scfg.output_dir, "model_exported"),
                             params=dense,
                             meta={"exported": True, "family": "swin",
                                   "acc1": exp_stats["acc1"],
                                   "supernet_best_acc1": max_acc,
                                   "model_cfg": dataclasses.asdict(dcfg_out),
                                   **meta})
        master_print("saved model_exported (sliced Swin subnet)")

        if args.export_finetune_epochs > 0:
            # recover the hard-pruning drop: plain supervised finetune of
            # the sliced subnet (the reference's stage 2, run_exp.sh:22)
            import optax
            from ofb_tpu.core.optim import cosine_schedule
            from ofb_tpu.core.steps import TrainState as TS
            ft_epochs = args.export_finetune_epochs
            ft_lr = (args.blr or 2.5e-4) * args.batch_size * world / 256
            # the finetune feed runs accum_iter=1 with a per-batch step,
            # so it takes accum_iter x more optimizer steps per epoch
            # than steps_per_epoch (which counts macro-batches) — scale
            # the horizon or the cosine hits min_lr accum_iter x early
            ft_steps_per_epoch = steps_per_epoch * scfg.accum_iter
            sch = cosine_schedule(
                ft_lr, ScheduleConfig(warmup_lr=1e-6, min_lr=1e-6,
                                      warmup_epochs=min(5, ft_epochs // 4)),
                ft_epochs * ft_steps_per_epoch, ft_steps_per_epoch)
            ftx = optax.adamw(sch, weight_decay=0.05)
            dense_dev = replicate(mesh, jax.tree_util.tree_map(jnp.asarray,
                                                               dense))
            fstate = TS(step=jnp.asarray(0, jnp.int32), params=dense_dev,
                        alphas=None, arch=None,
                        opt_state=ftx.init(dense_dev))

            from ofb_tpu.models.swin import swin_forward

            @jax.jit
            def ft_step(st, images, labels, rng):
                def loss_fn(p):
                    logits = swin_forward(p, images[0], dcfg_out, train=True,
                                          rng=rng, compute_dtype=compute)
                    import ofb_tpu.core.losses as L
                    return L.base_criterion(logits, labels[0],
                                            soft_labels=False,
                                            smoothing=args.smoothing)
                loss, g = jax.value_and_grad(loss_fn)(st.params)
                upd, no = ftx.update(g, st.opt_state, st.params)
                return st.replace(step=st.step + 1,
                                  params=optax.apply_updates(st.params, upd),
                                  opt_state=no), {"loss": loss}

            ft_planned = None
            if planned_active:
                # one-dispatch-per-step finetune over the device cache
                # (steps.make_planned_train_step analog on the sliced
                # Swin; driven by engine.train_one_epoch_planned)
                from ofb_tpu.ops.augment import train_augment_batch

                @jax.jit
                def ft_planned(st, cache, idx_plan, labels_plan, epoch_key,
                               epoch_base):
                    it = st.step - epoch_base       # ft runs accum 1
                    idx = jax.lax.dynamic_index_in_dim(idx_plan, it,
                                                       keepdims=False)
                    lbls = jax.lax.dynamic_index_in_dim(labels_plan, it,
                                                        keepdims=False)
                    imgs = jnp.take(cache, idx, axis=0)
                    sub = jax.random.fold_in(epoch_key, it)
                    rng_aug, rng_fwd = jax.random.split(sub)
                    imgs = train_augment_batch(
                        rng_aug, imgs, out_size=out_size,
                        use_randaug=bool(args.aa), re_prob=args.reprob,
                        crop_scale=(args.min_crop_scale, 1.0),
                        hflip=args.hflip)
                    fst, fm = ft_step(st, imgs[None], lbls[None], rng_fwd)
                    return fst, fm["loss"]

            ft_best = 0.0
            ft_best_params = fstate.params
            frng = jax.random.PRNGKey(scfg.seed + 777)
            for fe in range(ft_epochs):
                frng, a, b = jax.random.split(frng, 3)
                if ft_planned is not None:
                    from ofb_tpu.core.engine import train_one_epoch_planned
                    from ofb_tpu.data.samplers import (distributed_indices,
                                                       epoch_batches)
                    n_cache = int(cache_train[0].shape[0])
                    plan_idx = distributed_indices(
                        n_cache, fe, rank, world, shuffle=True,
                        seed=scfg.seed)
                    batches = epoch_batches(plan_idx, args.batch_size,
                                            drop_last=True)
                    fstate, _ = train_one_epoch_planned(
                        fstate, ft_planned, cache_train[0], cache_train[1],
                        batches, epoch=fe, rng=a)
                else:
                    ffeed = train_feed(fe, a, batch=args.batch_size,
                                       ra=False, accum=1)
                    for images, labels in ffeed:     # (A=1, mb, H, W, 3)
                        b, sub = jax.random.split(b)
                        fstate, fm = ft_step(fstate, images, labels, sub)
                if fe % max(args.eval_every, 1) == 0 or fe == ft_epochs - 1:
                    fstats = evaluate(dense_eval, val_feed(), fstate.params)
                    if fstats["acc1"] >= ft_best:
                        # snapshot the weights that achieved the recorded
                        # acc1 — the saved checkpoint must not overstate
                        ft_best = fstats["acc1"]
                        ft_best_params = fstate.params
            master_print(f"finetuned subnet acc1 {ft_best:.2f}% "
                         f"(exported {exp_stats['acc1']:.2f}%, supernet "
                         f"best {max_acc:.2f}%)")
            ckpt.save_checkpoint(
                os.path.join(scfg.output_dir, "model_finetuned"),
                params=ft_best_params,
                meta={"exported": True, "family": "swin",
                      "acc1": ft_best,
                      "model_cfg": dataclasses.asdict(dcfg_out), **meta})

    ckpt.wait_for_pending_saves()
    master_print(f"Swin search time "
                 f"{time.strftime('%H:%M:%S', time.gmtime(time.time() - t0))}")
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser("OFB TPU Swin search",
                                     parents=[get_args_parser()])
    from ofb_tpu.utils.resilience import run_with_auto_resume
    run_with_auto_resume(main, parser.parse_args())
