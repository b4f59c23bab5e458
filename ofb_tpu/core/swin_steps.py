"""Jitted search train/eval steps for the searchable Swin family.

The reference's OFB-Swin is unreleased (reference README.md:27-31), so
this is the OFB method applied to Swin with the published DeiT-search
machinery: gated supernet forward + CE + adaptive one-hot sparsity losses
+ FLOPs targeting, three-family AdamW (the decoder family is unused —
Swin search here trains supervised, no PMIM decoder), gradient
accumulation, converged-alpha freezing. Shares the compress state machine
and TrainState with the ViT path (core/steps.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import SearchConfig
from ..models.search_space import SearchSpace
from ..models.swin import SwinCfg
from ..models.swin_search import swin_model_flops, swin_search_forward
from ..ops.mixup import mixup_cutmix
from . import losses as L
from .steps import TrainState, _freeze_finished_alpha_updates


def swin_arch_loss(params, alphas, arch, space: SearchSpace, cfg: SwinCfg,
                   *, target_flops: float, w_head: float, w_mlp: float,
                   w_embedding: float, w_flops: float, entropy=True,
                   var=True, norm=True):
    """Weighted arch loss over the Swin layout (analog of ofb_arch_loss;
    reference losses.py:91-102 + base_model.py:31-35)."""
    total, searched = swin_model_flops(alphas, arch, space, cfg)
    fl = jnp.square((searched - target_flops) / total)
    sp = L.sparsity_losses(params, alphas, arch, space, entropy=entropy,
                           var=var, norm=norm)
    arch_total = (w_head * sp["attn"] + w_mlp * sp["mlp"]
                  + w_embedding * sp["embed"] + w_flops * fl)
    return arch_total, {"searched_gflops": searched}


def make_swin_search_step(space: SearchSpace, cfg: SwinCfg,
                          scfg: SearchConfig,
                          tx: optax.GradientTransformation, *,
                          phase: str = "search",
                          teacher_apply: Optional[Callable] = None,
                          compute_dtype=jnp.bfloat16, donate: bool = False,
                          fused_augment: bool = False,
                          aug_use_randaug: bool = True,
                          aug_re_prob: float = 0.25,
                          aug_crop_scale=(0.08, 1.0),
                          aug_hflip: bool = True):
    """step(state, images (A,mb,H,W,3), labels (A,mb), rng) ->
    (state, metrics). fused_augment: images are raw uint8 staging batches
    and the train transform runs inside the step program."""
    assert phase in ("search", "postsearch")
    dcfg = scfg.distillation

    def loss_fn(params, alphas, arch, images, labels, rng):
        if fused_augment:
            # extra split keeps the classic rng stream untouched when off
            rng_aug, rng = jax.random.split(rng)
            from ..ops.augment import train_augment_batch
            images = train_augment_batch(
                rng_aug, images, out_size=cfg.img_size,
                use_randaug=aug_use_randaug, re_prob=aug_re_prob,
                crop_scale=aug_crop_scale, hflip=aug_hflip)
        rng_fwd, rng_mix = jax.random.split(rng)
        soft = False
        if phase == "postsearch":
            images, labels = mixup_cutmix(
                rng_mix, images, labels, num_classes=cfg.num_classes,
                mixup_alpha=0.8, cutmix_alpha=1.0,
                cutmix_minmax=scfg.mixup.cutmix_minmax,
                prob=scfg.mixup.prob, switch_prob=scfg.mixup.switch_prob,
                mode=scfg.mixup.mode,
                label_smoothing=scfg.mixup.label_smoothing)
            soft = True
        logits = swin_search_forward(params, alphas, arch, images, cfg,
                                     space, train=True, rng=rng_fwd,
                                     compute_dtype=compute_dtype)
        base = L.base_criterion(logits, labels, soft_labels=soft,
                                smoothing=scfg.mixup.label_smoothing)
        if teacher_apply is not None and dcfg.distillation_type != "none":
            base = L.distillation_loss(
                base, logits, teacher_apply(images),
                kind=dcfg.distillation_type, alpha=dcfg.alpha, tau=dcfg.tau)
        metrics = {"loss_param": base}
        total = base
        if phase == "search":
            arch_loss, aux = swin_arch_loss(
                params, alphas, arch, space, cfg,
                target_flops=scfg.target_flops, w_head=scfg.w_head,
                w_mlp=scfg.w_mlp, w_embedding=scfg.w_embedding,
                w_flops=scfg.w_flops, entropy=scfg.entropy, var=scfg.var,
                norm=scfg.norm)
            total = total + arch_loss
            metrics.update(loss_arch=arch_loss,
                           searched_gflops=aux["searched_gflops"])
        metrics["loss_total"] = total
        return total, metrics

    grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)

    def step(state: TrainState, images, labels, rng):
        A = images.shape[0]

        def micro(carry, xs):
            g_acc, m_acc = carry
            img, lbl, r = xs
            g, m = grad_fn(state.params, state.alphas, state.arch, img,
                           lbl, r)
            return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                    jax.tree_util.tree_map(jnp.add, m_acc, m)), None

        rngs = jax.random.split(rng, A)
        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32),
            (state.params, state.alphas))
        zero_m = {k: jnp.asarray(0.0, jnp.float32) for k in (
            ["loss_param", "loss_total"]
            + (["loss_arch", "searched_gflops"] if phase == "search"
               else []))}
        (grads, metrics), _ = jax.lax.scan(
            micro, (zero_g, zero_m), (images, labels, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / A, grads)
        metrics = {k: v / A for k, v in metrics.items()}
        metrics["grad_norm"] = optax.global_norm(grads[0])

        updates, new_opt = tx.update(grads, state.opt_state,
                                     (state.params, state.alphas))
        pu, au = updates
        au = _freeze_finished_alpha_updates(au, state.arch)
        new_state = state.replace(
            step=state.step + A,
            params=optax.apply_updates(state.params, pu),
            alphas=optax.apply_updates(state.alphas, au),
            opt_state=new_opt)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_swin_train_step_dense(cfg: SwinCfg, tx: optax.GradientTransformation,
                               *, smoothing: float = 0.1,
                               compute_dtype=jnp.bfloat16,
                               donate: bool = False):
    """Plain supervised train step on a dense (gate-free) Swin.

    The A/B comparator for the search step — same batch, same shapes, no
    bi-mask/arch-loss machinery — so Swin search overhead can be reported
    like the DeiT +11.2% number (perf_breakdown.py dense_step analog).
    Takes (A, B, H, W, C) stacked micro-batches like every step here.
    """
    from ..models.swin import swin_forward

    def loss_fn(params, images, labels, rng):
        logits = swin_forward(params, images, cfg, train=True, rng=rng,
                              compute_dtype=compute_dtype)
        loss = L.base_criterion(logits, labels, soft_labels=False,
                                smoothing=smoothing)
        return loss, {"loss": loss}

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def step(state: TrainState, images, labels, rng):
        A = images.shape[0]

        def micro(carry, xs):
            g_acc, l_acc = carry
            img, lbl, r = xs
            g, m = grad_fn(state.params, img, lbl, r)
            return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                    l_acc + m["loss"]), None

        rngs = jax.random.split(rng, A)
        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        (grads, loss_sum), _ = jax.lax.scan(
            micro, (zero_g, jnp.asarray(0.0)), (images, labels, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / A, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + A, params=new_params,
                                  opt_state=new_opt)
        return new_state, {"loss": loss_sum / A}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_swin_eval_step(space: SearchSpace, cfg: SwinCfg, *,
                        compute_dtype=jnp.bfloat16, fused: bool = False):
    from .steps import _cls_metrics

    @jax.jit
    def step(params, alphas, arch, images, labels):
        logits = swin_search_forward(params, alphas, arch, images, cfg,
                                     space, train=False, fused=fused,
                                     compute_dtype=compute_dtype)
        return _cls_metrics(logits, labels)

    return step


def make_swin_eval_step_dense(cfg: SwinCfg, *, compute_dtype=jnp.bfloat16):
    """Eval step for an EXPORTED (sliced, gate-free) Swin: plain
    swin_forward with shape-driven widths. Shared by the search CLI's
    post-export eval and scripts/eval.py."""
    from ..models.swin import swin_forward
    from .steps import _cls_metrics

    @jax.jit
    def step(params, images, labels):
        logits = swin_forward(params, images, cfg, train=False,
                              compute_dtype=compute_dtype)
        return _cls_metrics(logits, labels)

    return step


SWIN_METRIC_KEYS_SEARCH = ("loss_param", "loss_total", "loss_arch",
                           "searched_gflops", "grad_norm")
SWIN_METRIC_KEYS_POSTSEARCH = ("loss_param", "loss_total", "grad_norm")


def make_planned_swin_search_step(space: SearchSpace, cfg: SwinCfg,
                                  scfg: SearchConfig,
                                  tx: optax.GradientTransformation, *,
                                  phase: str, steps_per_epoch: int,
                                  teacher_apply: Optional[Callable] = None,
                                  compute_dtype=jnp.bfloat16,
                                  donate: bool = False,
                                  use_randaug: bool = True,
                                  re_prob: float = 0.25,
                                  crop_scale=(0.08, 1.0),
                                  hflip: bool = True):
    """One-dispatch-per-iteration Swin search step over the device cache —
    the steps.make_planned_search_step analog (same signature, so
    engine.search_one_epoch_planned drives it unchanged): in-jit w_p
    anneal, uint8 cache gather, fold_in augment rng, packed f32 metrics.
    Swin has no PMIM keep-ratio, so no keep schedule is needed."""
    from .steps import w_p_schedule
    inner = make_swin_search_step(
        space, cfg, scfg, tx, phase=phase, teacher_apply=teacher_apply,
        compute_dtype=compute_dtype, donate=False, fused_augment=True,
        aug_use_randaug=use_randaug, aug_re_prob=re_prob,
        aug_crop_scale=crop_scale, aug_hflip=hflip)
    keys = SWIN_METRIC_KEYS_SEARCH if phase == "search" \
        else SWIN_METRIC_KEYS_POSTSEARCH
    A = scfg.accum_iter
    micro_per_epoch = steps_per_epoch * A
    warm = scfg.schedule.warmup_epochs

    def step(state: TrainState, cache, idx_plan, labels_plan, epoch_key,
             epoch_base, epoch):
        it = (state.step - epoch_base) // A
        frac_epoch = (epoch.astype(jnp.float32)
                      + (it * A).astype(jnp.float32)
                      / max(micro_per_epoch, 1))
        w_val = w_p_schedule(frac_epoch, warm)
        upd = lambda m: m.replace(w_p=jnp.where(m.finished, m.w_p, w_val))
        arch = state.arch
        arch = arch.replace(
            embed=upd(arch.embed),
            blocks=tuple(b.replace(attn=upd(b.attn), mlp=upd(b.mlp))
                         for b in arch.blocks),
            stage_embeds=tuple(upd(d) for d in arch.stage_embeds))

        idx = jax.lax.dynamic_index_in_dim(idx_plan, it, keepdims=False)
        lbls = jax.lax.dynamic_index_in_dim(labels_plan, it,
                                            keepdims=False)
        mb = idx.shape[0] // A
        imgs = jnp.take(cache, idx, axis=0)
        imgs = imgs.reshape(A, mb, *imgs.shape[1:])
        lbls = lbls.reshape(A, mb)
        sub = jax.random.fold_in(epoch_key, it)

        new_state, metrics = inner(state.replace(arch=arch), imgs, lbls,
                                   sub)
        packed = jnp.stack([metrics[k].astype(jnp.float32) for k in keys])
        return new_state, packed

    return jax.jit(step, donate_argnums=(0,) if donate else ()), keys
