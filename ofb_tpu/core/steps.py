"""Jitted train / search / eval steps.

One `search_step` covers everything the reference's inner loop does per
accumulation window (reference engine.py:95-198): PMIM anneal inputs, the
gated forward, the four loss families, gradient accumulation across
microbatches, the three-family optimizer update, per-iteration schedules and
EMA — all inside a single XLA program. Data parallelism comes from sharding
the batch over the mesh 'data' axis; XLA inserts the gradient all-reduce
(replacing DDP, reference search.py:619).

Static phases (each a separate jit specialization, re-traced at most once
per run):
  'search'      — MIM on, CE w/ label smoothing, arch losses on
                  (reference engine.py:118-144 pre-finish behavior)
  'postsearch'  — MIM off, decoder frozen, mixup+soft-target CE
                  (reference search.py:641-657 transition)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import SearchConfig
from ..models.mim_vit import mim_forward
from ..models.search_space import ArchState, SearchSpace
from ..models.vit import ModelCfg, vit_forward
from ..ops.mixup import mixup_cutmix
from . import losses as L


@struct.dataclass
class TrainState:
    step: jnp.ndarray                 # micro-iteration counter (int32)
    params: Any
    alphas: Any
    arch: ArchState
    opt_state: Any
    ema_params: Optional[Any] = None


def _tree_scale(tree, flag):
    return jax.tree_util.tree_map(lambda u: u * flag, tree)


def _freeze_finished_alpha_updates(alpha_updates, arch: ArchState):
    """Zero alpha updates of converged modules — the reference sets
    requires_grad=False on them (models/layers.py:221,563,887), which also
    stops AdamW weight decay from drifting a frozen alpha."""
    live = lambda f: 1.0 - f.astype(jnp.float32)
    out = dict(alpha_updates)
    out["patch"] = alpha_updates["patch"] * live(arch.patch.finished)
    out["embed"] = alpha_updates["embed"] * live(arch.embed.finished)
    if "stage_embeds" in alpha_updates:        # Swin per-stage widths
        out["stage_embeds"] = [
            alpha_updates["stage_embeds"][s] * live(d.finished)
            for s, d in enumerate(arch.stage_embeds)]
    blocks = []
    for i, b in enumerate(arch.blocks):
        blocks.append({
            "attn": alpha_updates["blocks"][i]["attn"] * live(b.attn.finished),
            "mlp": alpha_updates["blocks"][i]["mlp"] * live(b.mlp.finished),
        })
    out["blocks"] = blocks
    return out


def make_search_step(space: SearchSpace, mcfg: ModelCfg, scfg: SearchConfig,
                     tx: optax.GradientTransformation, *, phase: str,
                     param_mask=None, alpha_mask=None,
                     teacher_apply: Optional[Callable] = None,
                     compute_dtype=jnp.bfloat16, donate: bool = True,
                     fused_augment: bool = False, use_randaug: bool = True,
                     re_prob: float = 0.25, crop_scale=(0.08, 1.0),
                     hflip: bool = True, fused_model: bool = False):
    """Build the jitted search-phase train step.

    Returns step(state, images (A,mb,H,W,C), labels (A,mb), rng, keep_ratio)
    -> (state, metrics). A = accum_iter microbatches per optimizer update
    (reference run_exp.sh:11-13 eff. batch = batch x ranks x accum).

    fused_augment: images are raw uint8 staging batches (A, mb, S, S, 3)
    and the full train transform (ops/augment.py) runs inside the same XLA
    program as the step — one dispatch per batch, no separate augment
    round-trip.
    """
    assert phase in ("search", "postsearch")
    use_mim = phase == "search"
    dcfg = scfg.distillation

    def loss_fn(params, alphas, arch, images, labels, rng, keep_ratio):
        rng_m, rng_fwd, rng_mix = jax.random.split(rng, 3)
        if fused_augment:
            from ..ops.augment import train_augment_batch
            images = train_augment_batch(
                rng_m, images, out_size=mcfg.img_size,
                use_randaug=use_randaug, re_prob=re_prob,
                crop_scale=crop_scale, hflip=hflip)
        soft = False
        if phase == "postsearch":
            # finish_search transition enables Mixup(0.8)/CutMix(1.0) and
            # SoftTargetCE (reference search.py:650-655)
            images, labels = mixup_cutmix(
                rng_mix, images, labels, num_classes=mcfg.num_classes,
                mixup_alpha=0.8, cutmix_alpha=1.0,
                cutmix_minmax=scfg.mixup.cutmix_minmax,
                prob=scfg.mixup.prob, switch_prob=scfg.mixup.switch_prob,
                mode=scfg.mixup.mode,
                label_smoothing=scfg.mixup.label_smoothing)
            soft = True
        out = mim_forward(params, alphas, arch, images, mcfg, space,
                          train=True, use_mim=use_mim, fused=fused_model,
                          keep_ratio=keep_ratio, rng=rng_fwd,
                          compute_dtype=compute_dtype)
        if out.logits_dist is not None:
            base = L.distilled_pair_loss(
                out.logits, out.logits_dist, labels, soft_labels=soft,
                smoothing=scfg.mixup.label_smoothing)
            kd_logits = out.logits_dist
        else:
            base = L.base_criterion(out.logits, labels, soft_labels=soft,
                                    smoothing=scfg.mixup.label_smoothing)
            kd_logits = out.logits
        if teacher_apply is not None and dcfg.distillation_type != "none":
            t_logits = teacher_apply(images)
            base = L.distillation_loss(
                base, kd_logits, t_logits, kind=dcfg.distillation_type,
                alpha=dcfg.alpha, tau=dcfg.tau)

        metrics = {"loss_param": base}
        total = base
        if phase == "search":
            arch_loss, aux = L.ofb_arch_loss(
                params, alphas, arch, space, mcfg,
                target_flops=scfg.target_flops, w_head=scfg.w_head,
                w_mlp=scfg.w_mlp, w_patch=scfg.w_patch,
                w_embedding=scfg.w_embedding, w_flops=scfg.w_flops,
                entropy=scfg.entropy, var=scfg.var, norm=scfg.norm)
            total = total + arch_loss
            # dynamic decoder weight w = base/decoder (reference
            # engine.py:140-142), gradient flows into decoder_loss only
            dec = out.decoder_loss
            w_dec = jax.lax.stop_gradient(
                jnp.where(dec > 0, base / jnp.maximum(dec, 1e-12), 0.0))
            total = total + w_dec * dec
            metrics.update(loss_arch=arch_loss, loss_decoder=dec,
                           searched_gflops=aux["searched_gflops"])
        metrics["loss_total"] = total
        return total, metrics

    grad_fn = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)

    def core_step(state: TrainState, images, labels, rng, keep_ratio):
        A = images.shape[0]

        def micro(carry, xs):
            g_acc, m_acc = carry
            img, lbl, r = xs
            g, m = grad_fn(state.params, state.alphas, state.arch, img, lbl,
                           r, keep_ratio)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            m_acc = jax.tree_util.tree_map(jnp.add, m_acc, m)
            return (g_acc, m_acc), None

        rngs = jax.random.split(rng, A)
        zero_g = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32),
            (state.params, state.alphas))
        zero_m = {k: jnp.asarray(0.0, jnp.float32) for k in (
            ["loss_param", "loss_total"] + (
                ["loss_arch", "loss_decoder", "searched_gflops"]
                if phase == "search" else []))}
        (grads, metrics), _ = jax.lax.scan(
            micro, (zero_g, zero_m), (images, labels, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / A, grads)
        metrics = {k: v / A for k, v in metrics.items()}
        # global grad norm (reference NativeScalerWithGradNormCount /
        # get_grad_norm_, utils.py:282-329)
        metrics["grad_norm"] = optax.global_norm(grads[0])

        updates, new_opt = tx.update(grads, state.opt_state,
                                     (state.params, state.alphas))
        pu, au = updates
        if param_mask is not None:
            pu = jax.tree_util.tree_map(jnp.multiply, pu, param_mask)
        if alpha_mask is not None:
            au = jax.tree_util.tree_map(jnp.multiply, au, alpha_mask)
        au = _freeze_finished_alpha_updates(au, state.arch)
        if phase == "postsearch":
            # decoder + mask_token frozen after finish_search
            # (reference search.py:645 freeze_decoder)
            pu = _zero_decoder_updates(pu)
        new_params = optax.apply_updates(state.params, pu)
        new_alphas = optax.apply_updates(state.alphas, au)

        ema = state.ema_params
        if ema is not None:
            d = scfg.model_ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: e * d + (1.0 - d) * p, ema, new_params)

        new_state = state.replace(step=state.step + A, params=new_params,
                                  alphas=new_alphas, opt_state=new_opt,
                                  ema_params=ema)
        return new_state, metrics

    return jax.jit(core_step, donate_argnums=(0,) if donate else ())


METRIC_KEYS_SEARCH = ("loss_param", "loss_total", "loss_arch",
                      "loss_decoder", "searched_gflops", "grad_norm")
METRIC_KEYS_POSTSEARCH = ("loss_param", "loss_total", "grad_norm")


def w_p_schedule(frac_epoch, warmup_epochs,
                 w_max: float = 0.99, w_min: float = 0.1):
    """Clamped bi-mask anneal value (reference layers.py update_w). Works on
    host floats and traced scalars alike; the planned step and the host
    sync in the planned epoch loop both use THIS formula so the in-jit
    w_p and the checkpointed ArchState.w_p agree."""
    t = jnp.minimum(jnp.asarray(frac_epoch, jnp.float32)
                    / max(float(warmup_epochs), 1e-8), 1.0)
    return jnp.asarray(w_max, jnp.float32) + (w_min - w_max) * t


def keep_ratio_schedule(frac_epoch, scfg: SearchConfig, arch, space):
    """PMIM keep-ratio: progressive linear anneal max->min over warmup
    (reference vision_transformer.py:521-523) or, non-progressive, the
    smallest active patch cell's ratio — computed from device state so the
    planned step needs no host readback."""
    if scfg.progressive:
        t = jnp.minimum(jnp.asarray(frac_epoch, jnp.float32)
                        / max(scfg.schedule.warmup_epochs, 1e-8), 1.0)
        return scfg.max_ratio + (scfg.min_ratio - scfg.max_ratio) * t
    ratios = jnp.asarray(space.patch.ratios, jnp.float32)
    return jnp.min(jnp.where(arch.patch.switch, ratios, 1.0))


def make_planned_search_step(space: SearchSpace, mcfg: ModelCfg,
                             scfg: SearchConfig,
                             tx: optax.GradientTransformation, *,
                             phase: str, steps_per_epoch: int,
                             param_mask=None, alpha_mask=None,
                             teacher_apply: Optional[Callable] = None,
                             compute_dtype=jnp.bfloat16,
                             donate: bool = False,
                             use_randaug: bool = True, re_prob: float = 0.25,
                             crop_scale=(0.08, 1.0), hflip: bool = True,
                             fused_model: bool = False):
    """Single-dispatch-per-step epoch driver for the device-resident cache.

    The classic loop pays ~10 host->relay round-trips per iteration (rng
    split, w_p anneal program, keep-ratio upload, cache gather, label
    upload, batch reshape/placement, execute, metric handling); on a
    relay-attached TPU host that chatter costs more than the step itself
    (BENCH.md "Device-resident dataset cache": 752 vs 1505 img/s). Here
    the WHOLE epoch plan lives on device:

      step(state, cache, idx_plan, labels_plan, epoch_key, epoch_base,
           epoch) -> (state, packed_metrics)

    where idx_plan/labels_plan are (steps_per_epoch, A*mb) device arrays
    uploaded once per epoch, and everything per-iteration — the iteration
    index (from state.step), the w_p / PMIM keep-ratio anneals (reference
    engine.py:102-117), the augment rng (fold_in(epoch_key, it)), the
    uint8 cache gather, the device-side train transform, and the metric
    packing (one f32 vector instead of K scalars) — happens inside the
    one jitted program. Every argument is device-resident, so each
    iteration is exactly one execute dispatch.
    """
    inner = make_search_step(
        space, mcfg, scfg, tx, phase=phase, param_mask=param_mask,
        alpha_mask=alpha_mask, teacher_apply=teacher_apply,
        compute_dtype=compute_dtype, donate=False, fused_augment=True,
        use_randaug=use_randaug, re_prob=re_prob, crop_scale=crop_scale,
        hflip=hflip, fused_model=fused_model)
    keys = METRIC_KEYS_SEARCH if phase == "search" \
        else METRIC_KEYS_POSTSEARCH
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
        keep = keep_ratio_schedule(frac_epoch, scfg, arch, space)

        idx = jax.lax.dynamic_index_in_dim(idx_plan, it, keepdims=False)
        lbls = jax.lax.dynamic_index_in_dim(labels_plan, it,
                                            keepdims=False)
        mb = idx.shape[0] // A
        imgs = jnp.take(cache, idx, axis=0)
        imgs = imgs.reshape(A, mb, *imgs.shape[1:])
        lbls = lbls.reshape(A, mb)
        sub = jax.random.fold_in(epoch_key, it)

        new_state, metrics = inner(state.replace(arch=arch), imgs, lbls,
                                   sub, keep)
        # in-jit w_p is a pure function of frac_epoch; keep the classic
        # invariant that state.arch carries the LAST applied value so
        # compress/eval/checkpoint see it (host loop re-syncs at epoch end)
        packed = jnp.stack([metrics[k].astype(jnp.float32) for k in keys])
        return new_state, packed

    return jax.jit(step, donate_argnums=(0,) if donate else ()), keys


def _zero_decoder_updates(param_updates):
    out = dict(param_updates)
    if "decoder" in out:
        out["decoder"] = jax.tree_util.tree_map(jnp.zeros_like,
                                                out["decoder"])
    if "mask_token" in out:
        out["mask_token"] = jnp.zeros_like(out["mask_token"])
    return out


# ---------------------------------------------------------------------------
# Finetune / plain train step (reference engine.py:18-72)
# ---------------------------------------------------------------------------

def make_train_step(mcfg: ModelCfg, tx: optax.GradientTransformation, *,
                    num_classes: int, mixup_cfg=None, smoothing: float = 0.1,
                    ema_decay: Optional[float] = None,
                    teacher_apply: Optional[Callable] = None,
                    distill=None, compute_dtype=jnp.bfloat16,
                    donate: bool = True, fused_augment: bool = False,
                    aug_use_randaug: bool = True, aug_re_prob: float = 0.25,
                    aug_crop_scale=(0.08, 1.0), aug_hflip: bool = True):
    """Plain supervised train step for the finetune stage.

    donate=False is required on the axon TPU relay (buffer donation stalls
    it — CLAUDE.md); scripts/finetune.py passes False like search.py does.
    fused_augment: images are raw uint8 staging batches and the train
    transform runs inside the step program (one dispatch per batch).
    """

    def loss_fn(params, images, labels, rng):
        if fused_augment:
            # extra split keeps the classic (pre-augmented-feed) rng
            # stream untouched when fused_augment is off
            rng_aug, rng = jax.random.split(rng)
            from ..ops.augment import train_augment_batch
            images = train_augment_batch(
                rng_aug, images, out_size=mcfg.img_size,
                use_randaug=aug_use_randaug, re_prob=aug_re_prob,
                crop_scale=aug_crop_scale, hflip=aug_hflip)
        rng_fwd, rng_mix = jax.random.split(rng)
        soft = False
        if mixup_cfg is not None and (mixup_cfg.mixup > 0 or
                                      mixup_cfg.cutmix > 0):
            images, labels = mixup_cutmix(
                rng_mix, images, labels, num_classes=num_classes,
                mixup_alpha=mixup_cfg.mixup, cutmix_alpha=mixup_cfg.cutmix,
                cutmix_minmax=mixup_cfg.cutmix_minmax,
                prob=mixup_cfg.prob, switch_prob=mixup_cfg.switch_prob,
                mode=mixup_cfg.mode,
                label_smoothing=mixup_cfg.label_smoothing)
            soft = True
        out = vit_forward(params, images, mcfg, train=True, rng=rng_fwd,
                          compute_dtype=compute_dtype)
        if isinstance(out, tuple):
            logits, logits_dist = out
            base = L.base_criterion(logits, labels, soft_labels=soft,
                                    smoothing=smoothing)
            kd_logits = logits_dist
        else:
            logits = out
            base = L.base_criterion(logits, labels, soft_labels=soft,
                                    smoothing=smoothing)
            kd_logits = logits
        if teacher_apply is not None and distill is not None and \
                distill.distillation_type != "none":
            base = L.distillation_loss(
                base, kd_logits, teacher_apply(images),
                kind=distill.distillation_type, alpha=distill.alpha,
                tau=distill.tau)
        return base, {"loss": base}

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
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + (1.0 - ema_decay) * p,
                ema, new_params)
        new_state = state.replace(step=state.step + A, params=new_params,
                                  opt_state=new_opt, ema_params=ema)
        return new_state, {"loss": loss_sum / A}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_planned_train_step(mcfg: ModelCfg,
                            tx: optax.GradientTransformation, *,
                            num_classes: int, accum_iter: int = 1,
                            mixup_cfg=None, smoothing: float = 0.1,
                            ema_decay: Optional[float] = None,
                            teacher_apply: Optional[Callable] = None,
                            distill=None, compute_dtype=jnp.bfloat16,
                            donate: bool = False,
                            use_randaug: bool = True, re_prob: float = 0.25,
                            crop_scale=(0.08, 1.0), hflip: bool = True):
    """One-dispatch-per-iteration finetune step over the device cache —
    the make_planned_search_step analog for the plain train loop: the
    epoch index/label plan lives on device, and the cache gather, augment
    rng (fold_in(epoch_key, it)), device-side train transform and loss
    all run inside the single jitted program.

      step(state, cache, idx_plan, labels_plan, epoch_key, epoch_base)
        -> (state, loss scalar)
    """
    inner = make_train_step(
        mcfg, tx, num_classes=num_classes, mixup_cfg=mixup_cfg,
        smoothing=smoothing, ema_decay=ema_decay,
        teacher_apply=teacher_apply, distill=distill,
        compute_dtype=compute_dtype, donate=False, fused_augment=True,
        aug_use_randaug=use_randaug, aug_re_prob=re_prob,
        aug_crop_scale=crop_scale, aug_hflip=hflip)
    A = accum_iter

    def step(state: TrainState, cache, idx_plan, labels_plan, epoch_key,
             epoch_base):
        it = (state.step - epoch_base) // A
        idx = jax.lax.dynamic_index_in_dim(idx_plan, it, keepdims=False)
        lbls = jax.lax.dynamic_index_in_dim(labels_plan, it,
                                            keepdims=False)
        mb = idx.shape[0] // A
        imgs = jnp.take(cache, idx, axis=0)
        imgs = imgs.reshape(A, mb, *imgs.shape[1:])
        lbls = lbls.reshape(A, mb)
        sub = jax.random.fold_in(epoch_key, it)
        new_state, metrics = inner(state, imgs, lbls, sub)
        return new_state, metrics["loss"]

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Eval steps
# ---------------------------------------------------------------------------

def make_eval_step(space: SearchSpace, mcfg: ModelCfg, *,
                   compute_dtype=jnp.bfloat16, fused: bool = False):
    """Search-model eval (reference engine.py:222-257: model returns
    (output, _); CE + top-1/top-5). fused=True evaluates a post-fuse
    supernet (scores folded into weights, gates off)."""

    @jax.jit
    def step(params, alphas, arch, images, labels):
        out = mim_forward(params, alphas, arch, images, mcfg, space,
                          train=False, use_mim=False, fused=fused,
                          compute_dtype=compute_dtype)
        return _cls_metrics(out.logits, labels)

    return step


def make_eval_step_dense(mcfg: ModelCfg, *, compute_dtype=jnp.bfloat16):
    @jax.jit
    def step(params, images, labels):
        logits = vit_forward(params, images, mcfg, train=False,
                             compute_dtype=compute_dtype)
        return _cls_metrics(logits, labels)

    return step


def _cls_metrics(logits, labels):
    loss = L.cross_entropy(logits, labels)
    top1 = jnp.sum((jnp.argmax(logits, -1) == labels))
    k = min(5, logits.shape[-1])
    top5 = jnp.sum(jnp.any(
        jax.lax.top_k(logits, k)[1] == labels[:, None], axis=-1))
    return {"loss_sum": loss * labels.shape[0],
            "top1": top1.astype(jnp.float32),
            "top5": top5.astype(jnp.float32),
            "count": jnp.asarray(labels.shape[0], jnp.float32)}
