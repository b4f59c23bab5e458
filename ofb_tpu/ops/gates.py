"""Bi-mask gate math — the core of the OFB search, as pure static-shape ops.

Implements, for every searchable dimension, the entangled gate

    g = w_p * sigmoid(score) + (1 - w_p) * rank_restore(weighted_mask)

where `weighted_mask` is the softmax(alpha)-weighted sum of candidate prefix
masks over *active* cells (reference models/layers.py:179-191 for patch-embed,
:493-509 for attention, :846-858 for MLP), and `rank_restore` maps the
sorted-domain mask back to original channel order by descending saliency
score (the double-argsort + gather in the reference).

Everything here is differentiable w.r.t. `alpha` and `score` and runs under
jit with static shapes; killed dimensions are expressed via the boolean
`switch` (softmax -inf trick) and the float `hard_mask` (1 = still in play),
never via slicing.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # avoids inf-inf NaNs in masked softmax while acting as -inf


def masked_softmax(alpha: jnp.ndarray, switch: jnp.ndarray) -> jnp.ndarray:
    """softmax over active cells only; inactive cells get exactly 0.

    Matches `alpha - where(switch, 0, inf)` then flat softmax
    (reference models/layers.py:179-181). Shapes are preserved.
    """
    a = jnp.where(switch, alpha.astype(jnp.float32), NEG_INF)
    flat = jax.nn.softmax(a.reshape(-1))
    return jnp.where(switch, flat.reshape(alpha.shape), 0.0)


def weighted_mask_1d(alpha: jnp.ndarray, switch: jnp.ndarray,
                     mask_bank: jnp.ndarray) -> jnp.ndarray:
    """Sorted-domain weighted mask for a 1-D width.

    alpha (K,), switch (K,), mask_bank (K, D) -> (D,)
    (reference models/layers.py:182-184).
    """
    p = masked_softmax(alpha, switch)
    return p @ mask_bank


def weighted_mask_attn(alpha: jnp.ndarray, switch: jnp.ndarray,
                       mask_bank: jnp.ndarray) -> jnp.ndarray:
    """Sorted-domain weighted mask for the joint head x channel space.

    alpha (Kh, Kc), switch (Kh, Kc), mask_bank (Kh, H, Kc, d) -> (H, d)
    (reference models/layers.py:494-497).
    """
    p = masked_softmax(alpha, switch)
    return jnp.einsum("ij,ihjd->hd", p, mask_bank)


def rank_restore_1d(sorted_vals: jnp.ndarray, score: jnp.ndarray,
                    hard_mask: jnp.ndarray) -> jnp.ndarray:
    """Map sorted-domain values back to channel order by descending score.

    restore[c] = sorted_vals[rank(c)], rank by score desc among channels with
    hard_mask > 0; hard-dead channels rank last (they were physically removed
    in the reference, so they land on zero-valued tail ranks).
    (reference models/layers.py:186-190 double argsort + gather.)
    """
    s = jnp.where(hard_mask > 0, score.astype(jnp.float32), -jnp.inf)
    order = jnp.argsort(-s)                 # channel ids in rank order
    ranks = jnp.argsort(order)              # rank of each channel
    return jnp.take(sorted_vals, ranks, axis=0)


def rank_restore_attn(sorted_vals: jnp.ndarray, score: jnp.ndarray,
                      hard_mask: jnp.ndarray) -> jnp.ndarray:
    """2-D restore for attention: head ranks by sum of sigmoid(score) over
    alive channels, channel ranks per head.

    sorted_vals (H, d), score (H, d) or broadcastable, hard_mask (H, d).
    (reference models/layers.py:499-506.)
    """
    H, d = sorted_vals.shape
    score = jnp.broadcast_to(score.astype(jnp.float32), (H, d))
    alive = hard_mask > 0

    # per-head channel ranks (dead channels last)
    s_chan = jnp.where(alive, score, -jnp.inf)
    chan_order = jnp.argsort(-s_chan, axis=1)
    chan_ranks = jnp.argsort(chan_order, axis=1)

    # head ranks by saliency mass (reference sums sigmoid(score) over the
    # head's surviving channels, layers.py:502)
    head_score = jnp.sum(jax.nn.sigmoid(score) * hard_mask, axis=1)
    head_alive = jnp.any(alive, axis=1)
    hs = jnp.where(head_alive, head_score, -jnp.inf)
    head_order = jnp.argsort(-hs)
    head_ranks = jnp.argsort(head_order)

    by_head = jnp.take(sorted_vals, head_ranks, axis=0)       # (H, d)
    return jnp.take_along_axis(by_head, chan_ranks, axis=1)


def bimask_gate_1d(score: jnp.ndarray, alpha: jnp.ndarray, switch: jnp.ndarray,
                   mask_bank: jnp.ndarray, hard_mask: jnp.ndarray,
                   w_p: jnp.ndarray, finished: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full gate for a 1-D width. Returns (gate, restore_mask).

    While searching: g = w_p*sigmoid(score) + (1-w_p)*restore, zeroed on
    hard-dead channels (their weights were sliced away in the reference).
    After convergence (finished): g = score directly — core/compress.py has
    already rewritten score to w_p*sigmoid(score)+(1-w_p) on kept channels and
    0 elsewhere (reference models/layers.py:275, 939; forward layers.py:197,
    859-860).
    """
    wm = weighted_mask_1d(alpha, switch, mask_bank)
    restore = rank_restore_1d(wm, score, hard_mask) * hard_mask
    search_gate = (w_p * jax.nn.sigmoid(score.astype(jnp.float32))
                   + (1.0 - w_p) * restore) * hard_mask
    gate = jnp.where(finished, score.astype(jnp.float32), search_gate)
    return gate, restore


def bimask_gate_attn(score: jnp.ndarray, alpha: jnp.ndarray,
                     switch: jnp.ndarray, mask_bank: jnp.ndarray,
                     hard_mask: jnp.ndarray, w_p: jnp.ndarray,
                     finished: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full gate for the attention head x channel space. Returns (gate (H,d),
    restore (H,d)). (reference models/layers.py:493-509, 518-521.)"""
    H, d = hard_mask.shape
    score_b = jnp.broadcast_to(score.astype(jnp.float32), (H, d))
    wm = weighted_mask_attn(alpha, switch, mask_bank)
    restore = rank_restore_attn(wm, score_b, hard_mask) * hard_mask
    search_gate = (w_p * jax.nn.sigmoid(score_b)
                   + (1.0 - w_p) * restore) * hard_mask
    gate = jnp.where(finished, score_b, search_gate)
    return gate, restore


def masked_layer_norm(x: jnp.ndarray, mask: jnp.ndarray, scale: jnp.ndarray,
                      bias: jnp.ndarray, *, eps: float = 1e-6,
                      passthrough: str = "zero") -> jnp.ndarray:
    """LayerNorm over the masked-in channel subset, static shape.

    The reference splits channels into reserved/dropped, normalizes the
    reserved subset, and concatenates (reference models/layers.py:192-195,
    models/vision_transformer.py:193-200, 663-666) — which *permutes* channel
    order. We instead normalize in place with masked moments, preserving
    channel order (semantically what the computation means; see SURVEY §7.3
    item 2).

    passthrough:
      'zero'     — dropped channels output 0 (patch-embed out / final norm:
                   the reference multiplies them by the zero mask values)
      'identity' — dropped channels pass through unchanged (block norm1/norm2,
                   reference vision_transformer.py:196,200)
    """
    xf = x.astype(jnp.float32)
    m = (mask > 0).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(m), 1.0)
    mean = jnp.sum(xf * m, axis=-1, keepdims=True) / cnt
    var = jnp.sum(jnp.square(xf - mean) * m, axis=-1, keepdims=True) / cnt
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    normed = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if passthrough == "zero":
        out = normed * m
    elif passthrough == "identity":
        out = jnp.where(m > 0, normed, xf)
    else:
        raise ValueError(passthrough)
    return out.astype(x.dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               *, eps: float = 1e-6) -> jnp.ndarray:
    """Plain LayerNorm (biased variance, matching torch F.layer_norm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def annealed_w_p(frac_epoch: jnp.ndarray, warmup_epochs: float,
                 w_max: float = 0.99, w_min: float = 0.1) -> jnp.ndarray:
    """Entanglement weight anneal w_p: w_max -> w_min over warmup
    (reference models/layers.py:169-171; frozen after warmup)."""
    t = jnp.clip(frac_epoch / max(warmup_epochs, 1e-8), 0.0, 1.0)
    return w_max + (w_min - w_max) * t


def annealed_mask_keep_ratio(frac_epoch: jnp.ndarray, warmup_epochs: float,
                             max_ratio: float = 0.95, min_ratio: float = 0.75
                             ) -> jnp.ndarray:
    """PMIM token keep-ratio anneal max->min over warmup
    (reference models/vision_transformer.py:521-523; frozen after warmup)."""
    t = jnp.clip(frac_epoch / max(warmup_epochs, 1e-8), 0.0, 1.0)
    return max_ratio - (max_ratio - min_ratio) * t
