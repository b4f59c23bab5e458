"""Loss stack: classification criteria, distillation, and the OFB search
losses (adaptive one-hot sparsity + FLOPs), as pure fp32 functions.

Reference: losses.py:10-106 (DistillationLoss, OFBSearchLOSS) and
models/base_model.py:31-86 (flops loss, adaptive one-hot loss).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.search_space import ArchState, SearchSpace
from ..models.vit import ModelCfg
from ..ops.flops import flops_loss
from ..ops.gates import masked_softmax


def _block_params(params, i: int):
    """The i-th transformer block's params; supports the ViT layout
    (params['blocks'][i]) and the Swin layout
    (params['stages'][s]['blocks'][b], blocks flattened across stages)."""
    if "blocks" in params:
        return params["blocks"][i]
    j = i
    for stage in params["stages"]:
        nb = len(stage["blocks"])
        if j < nb:
            return stage["blocks"][j]
        j -= nb
    raise IndexError(i)


# ---------------------------------------------------------------------------
# Classification criteria (timm equivalents used by the reference,
# search.py:581-585, 650-655)
# ---------------------------------------------------------------------------

def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Hard-label CE; labels int (B,)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def label_smoothing_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                       smoothing: float = 0.1) -> jnp.ndarray:
    """timm LabelSmoothingCrossEntropy."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    return jnp.mean((1.0 - smoothing) * nll + smoothing * smooth)


def soft_target_ce(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """timm SoftTargetCrossEntropy; target is a (B, C) distribution
    (mixup/cutmix labels)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-target * logp, axis=-1))


def base_criterion(logits: jnp.ndarray, labels: jnp.ndarray, *,
                   soft_labels: bool, smoothing: float) -> jnp.ndarray:
    """Dispatch matching reference search.py:581-585 / 650-655:
    soft-target CE when mixup is active, else label-smoothing CE (or plain
    CE when smoothing == 0)."""
    if soft_labels:
        return soft_target_ce(logits, labels)
    if smoothing > 0.0:
        return label_smoothing_ce(logits, labels, smoothing)
    return cross_entropy(logits, labels)


def distillation_loss(base_loss: jnp.ndarray, student_kd: Optional[jnp.ndarray],
                      teacher_logits: Optional[jnp.ndarray], *,
                      kind: str, alpha: float, tau: float) -> jnp.ndarray:
    """Teacher KD wrapper (reference losses.py:10-64)."""
    if kind == "none" or teacher_logits is None:
        return base_loss
    t = jax.lax.stop_gradient(teacher_logits.astype(jnp.float32))
    s = student_kd.astype(jnp.float32)
    if kind == "soft":
        T = tau
        kd = jnp.sum(jnp.exp(jax.nn.log_softmax(t / T, -1)) *
                     (jax.nn.log_softmax(t / T, -1) -
                      jax.nn.log_softmax(s / T, -1)))
        kd = kd * (T * T) / s.size
    elif kind == "hard":
        kd = cross_entropy(s, jnp.argmax(t, axis=-1))
    else:
        raise ValueError(kind)
    return base_loss * (1.0 - alpha) + kd * alpha


def distilled_pair_loss(logits: jnp.ndarray, logits_dist: jnp.ndarray,
                        labels: jnp.ndarray, *, soft_labels: bool,
                        smoothing: float) -> jnp.ndarray:
    """Search-phase loss for distilled models (reference losses.py:81-86):
    CE(cls) + CE(dist) + batchmean KL(dist || cls)."""
    base = base_criterion(logits, labels, soft_labels=soft_labels,
                          smoothing=smoothing)
    logp_d = jax.nn.log_softmax(logits_dist.astype(jnp.float32), -1)
    p_c = jax.nn.softmax(logits.astype(jnp.float32), -1)
    kl = jnp.sum(p_c * (jnp.log(jnp.clip(p_c, 1e-12)) - logp_d)) / \
        logits.shape[0]
    dist_ce = base_criterion(logits_dist, labels, soft_labels=soft_labels,
                             smoothing=smoothing)
    return base + dist_ce + kl


# ---------------------------------------------------------------------------
# Adaptive one-hot sparsity loss (reference models/base_model.py:37-86)
# ---------------------------------------------------------------------------

def _cell_loss(alpha: jnp.ndarray, switch: jnp.ndarray, *, entropy: bool,
               var: bool, divide_var_by_n: bool) -> jnp.ndarray:
    """Entropy + tan-variance terms over the active cells of one module.

    Numerics note (SURVEY §7.3 item 5): sigma_prob in [0,1] mathematically;
    we clamp away from the asymptotes of tan(pi/2 - pi*sigma) in fp32.
    Returns 0 for converged modules (a single active cell), matching the
    reference's skip (base_model.py:57-58).
    """
    n_active = jnp.sum(switch.astype(jnp.float32))
    p = masked_softmax(alpha, switch).reshape(-1)
    sw = switch.reshape(-1)

    loss = jnp.asarray(0.0, jnp.float32)
    if entropy:
        plogp = jnp.where(sw, p * jnp.log(jnp.clip(p, 1e-12)), 0.0)
        loss = loss - jnp.sum(plogp)
    if var:
        # mean over ACTIVE cells only (reference softmaxes alpha[switch])
        mean_p = 1.0 / jnp.maximum(n_active, 1.0)
        sigma = jnp.sum(jnp.where(sw, jnp.square(p - mean_p), 0.0))
        target_sigma = 1.0 - 1.0 / jnp.maximum(n_active, 1.0)
        sigma_prob = jnp.clip(sigma / jnp.maximum(target_sigma, 1e-12),
                              1e-6, 1.0 - 1e-6)
        tan_term = jnp.tan(math.pi / 2.0 - math.pi * sigma_prob)
        if divide_var_by_n:
            tan_term = tan_term / jnp.maximum(n_active, 1.0)
        loss = loss + tan_term
    return jnp.where(n_active > 1.0, loss, 0.0)


def _score_norm(score, hard_mask, weight: float) -> jnp.ndarray:
    """Score L1 term: sum(sigmoid(score)) over *surviving* dims * weight
    (reference base_model.py:72-78 sums prob_score of the physically-sliced
    score tensor, so hard-trimmed channels are excluded). `score` may be a
    broadcast shape like (H,1)/(1,d); the hard mask is reduced to match."""
    w = hard_mask
    for ax in range(score.ndim):
        if score.shape[ax] == 1 and w.shape[ax] != 1:
            w = jnp.max(w, axis=ax, keepdims=True)
    return jnp.sum(jax.nn.sigmoid(score.astype(jnp.float32)) * w) * weight


def sparsity_losses(params, alphas, arch: ArchState, space: SearchSpace, *,
                    entropy: bool = True, var: bool = True, norm: bool = True
                    ) -> Dict[str, jnp.ndarray]:
    """Grouped sparsity losses (loss_attn, loss_mlp, loss_patch, loss_embed),
    matching reference models/base_model.py:37-86."""
    zero = jnp.asarray(0.0, jnp.float32)

    # patch dim: entropy + undivided tan-variance, no score term
    # (reference base_model.py:38-51)
    loss_patch = _cell_loss(alphas["patch"], arch.patch.switch,
                            entropy=True, var=True, divide_var_by_n=False)

    loss_embed = zero
    if space.embed.searchable:
        l = _cell_loss(alphas["embed"], arch.embed.switch, entropy=entropy,
                       var=var, divide_var_by_n=True)
        if norm:
            l = l + jnp.where(
                jnp.sum(arch.embed.switch) > 1,
                _score_norm(params["patch_embed"]["score"],
                            arch.embed.hard_mask, 1e-4), 0.0)
        loss_embed = loss_embed + l
    for s, ds in enumerate(space.stage_embeds):
        # Swin per-stage widths contribute to the embed group
        if not ds.searchable:
            continue
        ea = arch.stage_embeds[s]
        l = _cell_loss(alphas["stage_embeds"][s], ea.switch, entropy=entropy,
                       var=var, divide_var_by_n=True)
        if norm:
            l = l + jnp.where(
                jnp.sum(ea.switch) > 1,
                _score_norm(params["stages"][s]["embed_score"],
                            ea.hard_mask, 1e-4), 0.0)
        loss_embed = loss_embed + l

    loss_attn = zero
    loss_mlp = zero
    for i, bs in enumerate(space.blocks):
        ba = arch.blocks[i]
        if bs.attn.searchable:
            l = _cell_loss(alphas["blocks"][i]["attn"], ba.attn.switch,
                           entropy=entropy, var=var, divide_var_by_n=True)
            if norm:
                l = l + jnp.where(
                    jnp.sum(ba.attn.switch) > 1,
                    _score_norm(_block_params(params, i)["attn"]["score"],
                                ba.attn.hard_mask, 4e-4), 0.0)
            loss_attn = loss_attn + l
        if bs.mlp.searchable:
            l = _cell_loss(alphas["blocks"][i]["mlp"], ba.mlp.switch,
                           entropy=entropy, var=var, divide_var_by_n=True)
            if norm:
                l = l + jnp.where(
                    jnp.sum(ba.mlp.switch) > 1,
                    _score_norm(_block_params(params, i)["mlp"]["score"],
                                ba.mlp.hard_mask, 1e-4), 0.0)
            loss_mlp = loss_mlp + l
    return {"attn": loss_attn, "mlp": loss_mlp, "patch": loss_patch,
            "embed": loss_embed}


def ofb_arch_loss(params, alphas, arch: ArchState, space: SearchSpace,
                  cfg: ModelCfg, *, target_flops: float, w_head: float,
                  w_mlp: float, w_patch: float, w_embedding: float,
                  w_flops: float, entropy=True, var=True, norm=True
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted arch loss (reference losses.py:91-102). Returns
    (arch_loss, aux dict incl. searched GFLOPs)."""
    fl, searched = flops_loss(alphas, arch, space, cfg, target_flops)
    sp = sparsity_losses(params, alphas, arch, space, entropy=entropy,
                         var=var, norm=norm)
    arch_total = (w_head * sp["attn"] + w_mlp * sp["mlp"]
                  + w_patch * sp["patch"] + w_embedding * sp["embed"]
                  + w_flops * fl)
    aux = {"loss_flops": fl, "searched_gflops": searched, **{
        f"loss_{k}": v for k, v in sp.items()}}
    return arch_total, aux
