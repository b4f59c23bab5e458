"""Layer-wise learning-rate decay for finetune.

BEiT-style per-layer lr scales: scale = layer_decay ** (num_layers - depth)
(reference lr_decay.py:15-75; used by finetune.py:378-383). Implemented as
an optax transform that multiplies each parameter's update by its layer
scale, chained before the AdamW lr — equivalent to per-group lr scaling
(reference lr_sched.py:34-41 update_groups with lr_scale).
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

from .optim import _path_str, NO_DECAY_NAMES


def layer_id_for_vit(name: str, num_layers: int) -> int:
    """reference lr_decay.py:64-75: embeddings -> 0, blocks.i -> i+1,
    everything else (final norm, head) -> num_layers."""
    if name.startswith(("cls_token", "dist_token", "pos_embed", "mask_token")):
        return 0
    if name.startswith("patch_embed"):
        return 0
    if name.startswith("blocks."):
        return int(name.split(".")[1]) + 1
    return num_layers


def layer_scale_tree(params, layer_decay: float, num_layers: int):
    def scale(path, leaf):
        name = _path_str(path)
        lid = layer_id_for_vit(name, num_layers)
        return layer_decay ** (num_layers - lid)
    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_layer(params, layer_decay: float, num_layers: int
                   ) -> optax.GradientTransformation:
    scales = layer_scale_tree(params, layer_decay, num_layers)

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return (jax.tree_util.tree_map(lambda u, s: u * s, updates, scales),
                state)

    return optax.GradientTransformation(init_fn, update_fn)


def build_finetune_optimizer(params, *, lr_schedule, betas=(0.9, 0.999),
                             eps=1e-8, weight_decay=0.05,
                             layer_decay: Optional[float] = 0.95,
                             num_layers: int = 12,
                             clip_grad: Optional[float] = None
                             ) -> optax.GradientTransformation:
    """AdamW + layer-wise lr decay + no-decay skip list
    (reference finetune.py:378-383, lr_decay.py:15-61)."""

    def decay_label(path, leaf):
        name = _path_str(path)
        nd = (leaf.ndim <= 1 or name.endswith("bias")
              or any(k in name for k in NO_DECAY_NAMES))
        return "nd" if nd else "d"

    labels = jax.tree_util.tree_map_with_path(decay_label, params)

    def adamw(wd):
        tx = optax.adamw(learning_rate=lr_schedule, b1=betas[0], b2=betas[1],
                         eps=eps, weight_decay=wd)
        return tx

    tx = optax.multi_transform({"nd": adamw(0.0), "d": adamw(weight_decay)},
                               param_labels=labels)
    chain = []
    if clip_grad is not None:
        chain.append(optax.clip_by_global_norm(clip_grad))
    chain.append(tx)
    if layer_decay is not None and layer_decay < 1.0:
        chain.append(scale_by_layer(params, layer_decay, num_layers))
    return optax.chain(*chain)
