"""Progressive Masked Image Modeling (PMIM) ops.

TPU-native equivalents of the reference's SimMIM-style machinery:
  * `norm_targets` — local-window pixel standardization
    (reference models/vision_transformer.py:121-141)
  * `random_token_mask` — static-shape per-sample random masking with a
    *traced* keep count (reference models/vision_transformer.py:586-612 uses
    a Python int(L*r), which would force a recompile per annealed ratio;
    here the annealed ratio is a scalar operand compared against ranks)
  * `pixel_shuffle` — torch PixelShuffle semantics in NHWC
    (reference decoder, models/vision_transformer.py:491-496)
  * `patchify` — (reference models/vision_transformer.py:572-584)
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# Optional integral-image box filter (OFB_BOX_CUMSUM=1): O(1) adds/pixel
# per axis on paper vs O(k) for the separable reduce_window — but MEASURED
# SLOWER on v5e (1646 vs 1898 img/s on the DeiT-S search step): XLA lowers
# cumsum as a ~log(n)-pass parallel prefix, and the two batch-shared
# gathers add passes, while the sliding-window reduce is a single tuned
# pass. Kept correct + tested for backends where prefix sums win.
_BOX_CUMSUM = os.environ.get("OFB_BOX_CUMSUM", "0") == "1"
# Banded-matmul window sum (OFB_BOX_MATMUL): the separable k-wide window
# sum along an axis is a matmul with a constant banded 0/1 matrix — it
# rides the MXU at matmul rate instead of the VPU's O(k) adds/pixel.
# ~8.6 GMACs/axis for 256x224x224x3 vs ~14M VPU adds: more FLOPs, far
# faster silicon. MEASURED on v5e: 1902 -> 2011 img/s on the DeiT-S search
# step (+5.7%) — default ON; OFB_BOX_MATMUL=0 opts out (BENCH.md round 3).
_BOX_MATMUL = os.environ.get("OFB_BOX_MATMUL", "1") == "1"


def _window_sum_reduce(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sum over k x k windows, stride 1, SAME padding. NHWC.

    Two separable 1-D passes (O(2k) per pixel instead of O(k^2))."""
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window_dimensions=(1, k, 1, 1),
        window_strides=(1, 1, 1, 1), padding="SAME")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window_dimensions=(1, 1, k, 1),
        window_strides=(1, 1, 1, 1), padding="SAME")


def _window_sum_cumsum(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Same SAME-pad k x k window sum via integral images: per axis, one
    cumsum and a difference of two batch-shared gathers (indices are
    compile-time constants — no per-image gather, per the augment lesson).
    SAME padding puts (k-1)//2 before / k//2 after, matching reduce_window
    for even k as well as odd."""
    half_lo = (k - 1) // 2
    half_hi = k // 2

    def along(x, axis):
        n = x.shape[axis]
        c = jnp.cumsum(x, axis=axis)
        zero = jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=axis))
        p = jnp.concatenate([zero, c], axis=axis)          # prefix sums, n+1
        i = np.arange(n)
        hi = np.minimum(i + half_hi, n - 1) + 1            # exclusive upper
        lo = np.maximum(i - half_lo, 0)
        return jnp.take(p, hi, axis=axis) - jnp.take(p, lo, axis=axis)

    return along(along(x, 1), 2)


def _band_matrix(n: int, k: int) -> np.ndarray:
    """(n, n) 0/1 matrix with B[i, j] = 1 iff j falls in the SAME-padded
    k-window centred at i ((k-1)//2 before, k//2 after)."""
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    return ((j >= i - (k - 1) // 2) & (j <= i + k // 2)).astype(np.float32)


def _window_sum_matmul(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable window sum as two banded matmuls (MXU path). NHWC."""
    H, W = x.shape[1], x.shape[2]
    bh = jnp.asarray(_band_matrix(H, k))
    bw = bh if W == H else jnp.asarray(_band_matrix(W, k))
    x = jnp.einsum("gh,bhwc->bgwc", bh, x)
    return jnp.einsum("gw,bhwc->bhgc", bw, x)


def _window_sum(x: jnp.ndarray, k: int) -> jnp.ndarray:
    if _BOX_CUMSUM:
        return _window_sum_cumsum(x, k)
    if _BOX_MATMUL:
        return _window_sum_matmul(x, k)
    return _window_sum_reduce(x, k)


def norm_targets(targets: jnp.ndarray, patch_size: int = 47) -> jnp.ndarray:
    """Standardize each pixel by its local k x k window statistics.

    Matches reference models/vision_transformer.py:121-141 exactly:
    mean/sq-mean with count_include_pad=False, Bessel correction using the
    count_include_pad=True window count, var clamped at 0, eps 1e-6.
    targets: (B, H, W, C) fp32.
    """
    assert patch_size % 2 == 1
    x = targets.astype(jnp.float32)
    # in-bounds element count per window position — analytic (avoids a
    # multi-second XLA constant-fold of reduce_window over a ones tensor)
    H, W = x.shape[1], x.shape[2]
    half = patch_size // 2
    def axis_counts(n):
        i = np.arange(n)
        return (np.minimum(i + half, n - 1) - np.maximum(i - half, 0) + 1)
    cnt = (axis_counts(H)[:, None] * axis_counts(W)[None, :]).astype(
        np.float32)
    cnt = jnp.asarray(cnt)[None, :, :, None]
    mean = _window_sum(x, patch_size) / cnt
    sq_mean = _window_sum(jnp.square(x), patch_size) / cnt
    var = (sq_mean - jnp.square(mean)) * (cnt / jnp.maximum(cnt - 1.0, 1.0))
    var = jnp.maximum(var, 0.0)
    return (x - mean) / jnp.sqrt(var + 1e-6)


def random_token_mask(rng, batch: int, num_tokens: int,
                      keep_count: jnp.ndarray) -> jnp.ndarray:
    """Per-sample random token removal mask; 1 = removed, 0 = kept.

    Static shape (B, L); `keep_count` may be a traced scalar. Matches the
    argsort-noise construction of the reference
    (models/vision_transformer.py:596-608): the keep set is the keep_count
    tokens with the smallest noise.
    """
    noise = jax.random.uniform(rng, (batch, num_tokens))
    order = jnp.argsort(noise, axis=1)
    ranks = jnp.argsort(order, axis=1)
    return (ranks >= keep_count).astype(jnp.float32)


def pixel_shuffle_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch.nn.PixelShuffle in NHWC: (B,h,w,C*r*r) -> (B,h*r,w*r,C) with
    channel layout c*r*r + i*r + j (torch convention)."""
    B, h, w, crr = x.shape
    C = crr // (r * r)
    x = x.reshape(B, h, w, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)       # B, h, i, w, j, C
    return x.reshape(B, h * r, w * r, C)


def patchify(imgs: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, L, p*p*C) in the reference's token layout
    (models/vision_transformer.py:572-584: per-patch pixels (p,q) then
    channels last)."""
    B, H, W, C = imgs.shape
    h, w = H // p, W // p
    x = imgs.reshape(B, h, p, w, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)        # B h w p q c
    return x.reshape(B, h * w, p * p * C)


def mim_reconstruction_loss(imgs: jnp.ndarray, x_rec: jnp.ndarray,
                            token_mask: jnp.ndarray, patch_size: int,
                            in_chans: int = 3) -> jnp.ndarray:
    """Masked L1 against locally-normalized targets
    (reference models/vision_transformer.py:719-730).

    imgs, x_rec: (B, H, W, C); token_mask: (B, L) with 1 = masked (removed).
    """
    B, H, W, C = imgs.shape
    g = H // patch_size
    pix_mask = token_mask.reshape(B, g, g)
    pix_mask = jnp.repeat(jnp.repeat(pix_mask, patch_size, axis=1),
                          patch_size, axis=2)[..., None]     # (B,H,W,1)
    targets = norm_targets(imgs, 47)
    l1 = jnp.abs(targets - x_rec.astype(jnp.float32))
    return jnp.sum(l1 * pix_mask) / (jnp.sum(pix_mask) + 1e-5) / in_chans
