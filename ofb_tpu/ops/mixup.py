"""Device-side Mixup / CutMix with label smoothing.

Replaces timm's host-side `Mixup` (used by reference search.py:478-484,
650-655; engine.py:99-100) with a jittable transform so the whole
augmentation runs on TPU. Full timm parity surface:

  mode='batch'  one lambda/box per batch (timm _mix_batch)
  mode='pair'   one lambda/box per (i, B-1-i) pair, applied symmetrically
                (timm _mix_pair: both elements share the pair's params)
  mode='elem'   independent lambda/box/apply per element (timm _mix_elem)
  cutmix_minmax ratio-bounded box fully inside the image
                (timm rand_bbox_minmax); overrides the sqrt(1-lam) box

TPU notes: boxes are broadcast row/col comparisons against per-draw
corners — (N, H, W) masks from pure arithmetic, no gathers; every mode is
a fixed-shape computation (no data-dependent control flow).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jnp.ndarray, num_classes: int,
                   smoothing: float = 0.0) -> jnp.ndarray:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _box_mask(H: int, W: int, y1, y2, x1, x2) -> jnp.ndarray:
    """(N, H, W) masks with 1 inside [y1,y2) x [x1,x2) per draw."""
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    y1, y2 = y1[:, None, None], y2[:, None, None]
    x1, x2 = x1[:, None, None], x2[:, None, None]
    return ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
            ).astype(jnp.float32)


def _rand_bbox(rng, H: int, W: int, lam: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """timm rand_bbox: center anywhere, side ratio sqrt(1-lam), clipped at
    the borders. lam (N,) -> masks (N, H, W), corrected lam (N,)."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (H * cut_rat).astype(jnp.int32)
    cut_w = (W * cut_rat).astype(jnp.int32)
    n = lam.shape[0]
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (n,), 0, H)
    cx = jax.random.randint(kx, (n,), 0, W)
    y1 = jnp.clip(cy - cut_h // 2, 0, H)
    y2 = jnp.clip(cy + cut_h // 2, 0, H)
    x1 = jnp.clip(cx - cut_w // 2, 0, W)
    x2 = jnp.clip(cx + cut_w // 2, 0, W)
    box = _box_mask(H, W, y1, y2, x1, x2)
    lam_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)
    return box, lam_adj


def _rand_bbox_minmax(rng, H: int, W: int, n: int,
                      minmax: Tuple[float, float]
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """timm rand_bbox_minmax: per-side ratio uniform in [min, max), box
    fully inside the image; lam comes entirely from the box area."""
    kh, kw, ky, kx = jax.random.split(rng, 4)
    cut_h = jax.random.randint(kh, (n,), int(H * minmax[0]),
                               max(int(H * minmax[1]), int(H * minmax[0]) + 1))
    cut_w = jax.random.randint(kw, (n,), int(W * minmax[0]),
                               max(int(W * minmax[1]), int(W * minmax[0]) + 1))
    # randint with traced per-draw bounds: sample u in [0,1) and scale
    y1 = (jax.random.uniform(ky, (n,)) * (H - cut_h)).astype(jnp.int32)
    x1 = (jax.random.uniform(kx, (n,)) * (W - cut_w)).astype(jnp.int32)
    y2, x2 = y1 + cut_h, x1 + cut_w
    box = _box_mask(H, W, y1, y2, x1, x2)
    lam = 1.0 - (cut_h * cut_w) / (H * W)
    return box, lam.astype(jnp.float32)


def mixup_cutmix(rng, images: jnp.ndarray, labels: jnp.ndarray, *,
                 num_classes: int, mixup_alpha: float = 0.8,
                 cutmix_alpha: float = 1.0,
                 cutmix_minmax: Optional[Tuple[float, float]] = None,
                 prob: float = 1.0, switch_prob: float = 0.5,
                 mode: str = "batch", label_smoothing: float = 0.1
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixup/CutMix. images (B,H,W,C) float, labels int (B,).
    Returns (mixed images, soft labels (B, num_classes))."""
    if mode not in ("batch", "pair", "elem"):
        raise ValueError(f"mixup mode '{mode}' (batch | pair | elem)")
    B, H, W, _ = images.shape
    y = one_hot_smooth(labels, num_classes, label_smoothing)
    r_apply, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)

    use_mix = mixup_alpha > 0.0
    use_cut = cutmix_alpha > 0.0 or cutmix_minmax is not None
    if not use_mix and not use_cut:
        return images, y

    # number of independent parameter draws per batch
    n = {"batch": 1, "pair": B // 2, "elem": B}[mode]

    apply = jax.random.uniform(r_apply, (n,)) < prob
    if use_mix and use_cut:
        do_cut = jax.random.uniform(r_switch, (n,)) < switch_prob
    else:
        do_cut = jnp.full((n,), use_cut)

    lam_m = jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha, (n,)) \
        if use_mix else jnp.ones((n,))
    if cutmix_minmax is not None:
        box, lam_c_adj = _rand_bbox_minmax(r_box, H, W, n, cutmix_minmax)
    else:
        lam_c = jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha, (n,)) \
            if use_cut else jnp.ones((n,))
        box, lam_c_adj = _rand_bbox(r_box, H, W, lam_c)

    lam = jnp.where(do_cut, lam_c_adj, lam_m)       # (n,)
    box = box * do_cut[:, None, None]               # no box in mixup draws
    lam = jnp.where(apply, lam, 1.0)
    box = box * apply[:, None, None]

    # expand draws to per-element vectors of length B
    if mode == "batch":
        lam_e = jnp.broadcast_to(lam, (B,))
        box_e = jnp.broadcast_to(box, (B, H, W))
    elif mode == "pair":
        # pair (i, B-1-i) shares its params; odd middle element untouched
        mid = jnp.ones((B - 2 * n,))                # () or (1,)
        lam_e = jnp.concatenate([lam, mid, lam[::-1]])
        mbox = jnp.zeros((B - 2 * n, H, W))
        box_e = jnp.concatenate([box, mbox, box[::-1]], axis=0)
    else:
        lam_e, box_e = lam, box

    flip_im = images[::-1]
    flip_y = y[::-1]
    lam_im = lam_e[:, None, None, None].astype(images.dtype)
    box_im = box_e[:, :, :, None].astype(images.dtype)
    # cutmix where box is set, mixup elsewhere (box==0 everywhere for
    # mixup draws, so the two compose into one fused expression)
    mixed = lam_im * images + (1.0 - lam_im) * flip_im
    is_cut = (box_e.max(axis=(1, 2)) > 0)[:, None, None, None]
    base = jnp.where(is_cut, images, mixed)
    out_im = base * (1.0 - box_im) + flip_im * box_im
    out_y = lam_e[:, None] * y + (1.0 - lam_e[:, None]) * flip_y
    return out_im.astype(images.dtype), out_y
