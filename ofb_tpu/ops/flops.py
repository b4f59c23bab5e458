"""Differentiable FLOPs model of the searched network.

Mirrors the reference accounting exactly:
  * model level — reference models/vision_transformer.py:759-783
  * attention   — reference models/layers.py:747-766
  * MLP         — reference models/layers.py:1032-1044 (via params count)
  * block norms — reference models/vision_transformer.py:207-220

The searched FLOPs are a function of the softmax(alpha)-weighted cell sizes
(weighted_mask sums), so the FLOPs loss backpropagates into every alpha.
Cell-size vectors are static constants from the SearchSpace; no mask tensors
are materialized here.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..models.search_space import ArchState, SearchSpace
from ..models.vit import ModelCfg
from .gates import masked_softmax


def _wsum_1d(alpha, switch, cell_sizes) -> jnp.ndarray:
    """weighted_mask.sum() for a 1-D dim = sum_j p_j * size_j."""
    p = masked_softmax(alpha, switch)
    return p @ jnp.asarray(cell_sizes)


def _wsum_attn(alpha, switch, cell_sizes) -> jnp.ndarray:
    """weighted_mask.sum() for the joint head x channel grid."""
    p = masked_softmax(alpha, switch)
    return jnp.sum(p * jnp.asarray(cell_sizes))


def model_flops(alphas, arch: ArchState, space: SearchSpace, cfg: ModelCfg
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (total_gflops, searched_gflops), both fp32 scalars.

    total is the dense supernet; searched is the alpha-weighted expectation
    (reference models/vision_transformer.py:759-783)."""
    N = float(cfg.num_patches)
    D = float(cfg.embed_dim)
    H = float(cfg.num_heads)
    hd = float(cfg.hd)
    hid = float(cfg.hidden)
    C = float(cfg.num_classes)
    p2 = float(cfg.patch_size ** 2)

    ae = _wsum_1d(alphas["embed"], arch.embed.switch,
                  space.embed.cell_sizes)                     # active embed

    # active patches: full N until the first patch prune event
    # (reference vision_transformer.py:768 — model-level weighted_mask is
    # created lazily in compress, :813)
    ap_weighted = _wsum_1d(alphas["patch"], arch.patch.switch,
                           space.patch.cell_sizes)
    n = jnp.where(arch.patch.pruned_once, ap_weighted, N)

    total = N * D * 3.0 * p2
    searched = N * ae * 3.0 * p2

    for i, bs in enumerate(space.blocks):
        ba = arch.blocks[i]
        # layer norms (reference vision_transformer.py:212-213); active dim
        # is the physically-alive embed width (norm.normalized_shape[0])
        alive_e = jnp.sum(arch.embed.hard_mask)
        total += 2.0 * D * N
        searched += 2.0 * alive_e * n

        # attention (reference models/layers.py:755-765)
        sd = _wsum_attn(alphas["blocks"][i]["attn"], ba.attn.switch,
                        bs.attn.cell_sizes)
        aH = ba.attn.head_alive.astype(jnp.float32)
        total += N * (H * hd * (3 * H * hd)) + 3 * N * H * hd
        total += H * N * hd * N + H * N * N
        total += 5 * H * N * N
        total += H * N * N * hd
        total += N * (H * hd * (H * hd)) + N * H * hd
        searched += n * (ae * (3.0 * sd)) + 3.0 * n * sd
        searched += n * n * sd + aH * n * n
        searched += 5.0 * aH * n * n
        searched += n * n * sd
        searched += n * (sd * ae) + n * ae

        # MLP (reference models/layers.py:1032-1044: flops = params * tokens)
        am = _wsum_1d(alphas["blocks"][i]["mlp"], ba.mlp.switch,
                      bs.mlp.cell_sizes)
        total += (2.0 * (D * hid) + D + hid) * N
        searched += (ae * am + am * ae + ae + am) * n

    head_mult = 2.0 if cfg.distilled else 1.0
    total += head_mult * D * C
    searched += head_mult * ae * C
    return total / 1e9, searched / 1e9


def flops_loss(alphas, arch: ArchState, space: SearchSpace, cfg: ModelCfg,
               target_gflops: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """((searched - target)/total)^2 (reference models/base_model.py:31-35).
    Returns (loss, searched_gflops)."""
    total, searched = model_flops(alphas, arch, space, cfg)
    loss = jnp.square((searched - target_gflops) / total)
    return loss, searched


def searched_params_count(alphas, arch: ArchState, space: SearchSpace,
                          cfg: ModelCfg) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(total, searched) parameter counts of the searchable modules
    (reference models/base_model.py:104-110 with per-module
    get_params_count, layers.py:345-352, 735-745, 1032-1040)."""
    D = float(cfg.embed_dim)
    H = float(cfg.num_heads)
    hd = float(cfg.hd)
    hid = float(cfg.hidden)
    k2 = float(cfg.patch_size ** 2)
    in_ch = float(cfg.in_chans)

    ae = _wsum_1d(alphas["embed"], arch.embed.switch, space.embed.cell_sizes)
    total = in_ch * D * k2 + D + D * 2.0
    searched = in_ch * ae * k2 + ae + ae * 2.0
    for i, bs in enumerate(space.blocks):
        ba = arch.blocks[i]
        sd = _wsum_attn(alphas["blocks"][i]["attn"], ba.attn.switch,
                        bs.attn.cell_sizes)
        total += (H * hd) * (H * hd) * 3 + (H * hd) * 3
        total += (H * hd) * (H * hd) + H * hd
        searched += ae * sd * 3.0 + sd * 3.0
        searched += sd * ae + ae
        am = _wsum_1d(alphas["blocks"][i]["mlp"], ba.mlp.switch,
                      bs.mlp.cell_sizes)
        total += 2.0 * (D * hid) + D + hid
        searched += 2.0 * (ae * am) + ae + am
    return total, searched
