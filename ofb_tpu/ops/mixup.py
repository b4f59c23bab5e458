"""Device-side Mixup / CutMix with label smoothing.

Replaces timm's host-side `Mixup` (used by reference search.py:478-484,
650-655; engine.py:99-100) with a jittable batch-mode transform so the whole
augmentation runs on TPU. Semantics follow timm mode='batch': one lambda per
batch from Beta(alpha, alpha), switch to cutmix with probability
switch_prob when both are enabled, labels mixed as smoothed one-hots.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jnp.ndarray, num_classes: int,
                   smoothing: float = 0.0) -> jnp.ndarray:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng, H: int, W: int, lam: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """timm-style random box with area ratio ~ (1 - lam). Returns
    (pixel mask (H, W) with 1 inside the box, corrected lam)."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (H * cut_rat).astype(jnp.int32)
    cut_w = (W * cut_rat).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, H)
    cx = jax.random.randint(kx, (), 0, W)
    y1 = jnp.clip(cy - cut_h // 2, 0, H)
    y2 = jnp.clip(cy + cut_h // 2, 0, H)
    x1 = jnp.clip(cx - cut_w // 2, 0, W)
    x2 = jnp.clip(cx + cut_w // 2, 0, W)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    box = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2))
    area = (y2 - y1) * (x2 - x1)
    lam_adj = 1.0 - area / (H * W)
    return box.astype(jnp.float32), lam_adj


def mixup_cutmix(rng, images: jnp.ndarray, labels: jnp.ndarray, *,
                 num_classes: int, mixup_alpha: float = 0.8,
                 cutmix_alpha: float = 1.0, prob: float = 1.0,
                 switch_prob: float = 0.5, label_smoothing: float = 0.1
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-mode mixup/cutmix. images (B,H,W,C) float, labels int (B,).
    Returns (mixed images, soft labels (B, num_classes))."""
    B, H, W, _ = images.shape
    y = one_hot_smooth(labels, num_classes, label_smoothing)
    r_apply, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)

    use_mix = mixup_alpha > 0.0
    use_cut = cutmix_alpha > 0.0
    if not use_mix and not use_cut:
        return images, y

    apply = jax.random.uniform(r_apply) < prob
    flip_im = images[::-1]
    flip_y = y[::-1]

    if use_mix and use_cut:
        do_cut = jax.random.uniform(r_switch) < switch_prob
    else:
        do_cut = jnp.asarray(use_cut)

    lam_m = jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha) \
        if use_mix else jnp.asarray(1.0)
    lam_c = jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha) \
        if use_cut else jnp.asarray(1.0)

    box, lam_c_adj = _rand_bbox(r_box, H, W, lam_c)
    cut_images = images * (1.0 - box[None, :, :, None]) + \
        flip_im * box[None, :, :, None]
    mix_images = lam_m * images + (1.0 - lam_m) * flip_im

    out_im = jnp.where(do_cut, cut_images, mix_images)
    lam = jnp.where(do_cut, lam_c_adj, lam_m)
    out_y = lam * y + (1.0 - lam) * flip_y

    out_im = jnp.where(apply, out_im, images)
    out_y = jnp.where(apply, out_y, y)
    return out_im.astype(images.dtype), out_y
