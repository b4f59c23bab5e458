"""Device-side (jittable, batched) image augmentation.

TPU-native replacement for the reference's host-side timm/PIL transform
stack (reference datasets.py:127-163: RandomResizedCrop + flip + either
color-jitter 0.4 or RandAugment 'rand-m9-mstd0.5-inc1' + normalize +
RandomErasing p=0.25), so augmentation runs fused on-device instead of on
CPU workers (SURVEY §7.1 item 4 / BASELINE north star).

Host contract: the loader delivers fixed-size uint8 NHWC batches at a
staging resolution (default 256x256, shorter-side resize + center crop done
at decode time); all randomized augmentation happens here. Working dtype is
float32 in the 0..255 domain (PIL semantics), normalized at the end.

Deviations from timm (documented):
  * RandomResizedCrop samples its box from the fixed staging image rather
    than the original-resolution image (host decode must be static-shape).
  * RandAugment applies the two photometric slots before the single
    composed geometric warp instead of in random slot order (lets all
    geometric ops share one resample).
"""

from __future__ import annotations

import math
import os
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

# The RandAugment geometry passes are pure HBM traffic: 8 conditional
# power-of-two rolls over a (H, W+256, C) padded array, x3 shear passes,
# x2 RA layers. Rolling in uint8 moves 4x fewer bytes than float32
# (measured 58.4 -> 12.0 ms/batch-256 for one 3-pass set on v5e) and its
# round+clamp matches PIL's u8 image semantics (the reference's transform
# stack clamps at every op). Delta vs the f32 path: p99 < 1 uint8 LSB.
# OFB_AUG_ROLL_U8=0 restores float rolls (BENCH.md round 3).
_ROLL_U8 = os.environ.get("OFB_AUG_ROLL_U8", "1") == "1"

# RandomErasing noise in bfloat16: the per-image (H,W,C) N(0,1) draw is
# pure RNG-bit generation (f32 costs ~42 ms/batch-256 inside the fused
# augment program; bf16 makes it free — 85.3 -> 43.9 ms/batch measured).
# Noise precision is irrelevant for augmentation. OFB_ERASE_BF16=0 opts
# out (BENCH.md round 3).
_ERASE_BF16 = os.environ.get("OFB_ERASE_BF16", "1") == "1"

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# RandomResizedCrop + flip
# ---------------------------------------------------------------------------

def _sample_crop_box(rng, H, W, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """One crop box (y0, x0, h, w) in source pixels, timm semantics:
    area ~ U(scale)*HW, aspect ~ exp(U(log ratio)), 10 tries then center
    fallback — here a single rejection-free draw with clamping."""
    k_area, k_ratio, k_y, k_x = jax.random.split(rng, 4)
    area = jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1]) \
        * H * W
    log_r = jax.random.uniform(k_ratio, (), minval=math.log(ratio[0]),
                               maxval=math.log(ratio[1]))
    r = jnp.exp(log_r)
    w = jnp.sqrt(area * r)
    h = jnp.sqrt(area / r)
    w = jnp.clip(w, 8.0, W)
    h = jnp.clip(h, 8.0, H)
    y0 = jax.random.uniform(k_y, ()) * (H - h)
    x0 = jax.random.uniform(k_x, ()) * (W - w)
    return y0, x0, h, w


def random_resized_crop(rng, img: jnp.ndarray, out_size: int,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)
                        ) -> jnp.ndarray:
    """img (H, W, C) float -> (out, out, C), bilinear.

    Uses jax.image.scale_and_translate (separable resampling lowered to
    matmul-like ops — TPU-friendly) instead of per-channel gather
    interpolation."""
    H, W, C = img.shape
    y0, x0, h, w = _sample_crop_box(rng, H, W, scale, ratio)
    # scale_and_translate samples in[(o + .5 - t)/s - .5]; we want
    # out[o] = in[y0 + (o + .5) * h/out - .5]  =>  s = out/h, t = -y0 * s
    sy = out_size / h
    sx = out_size / w
    ty = -y0 * sy
    tx = -x0 * sx
    return jax.image.scale_and_translate(
        img, (out_size, out_size, C), (0, 1),
        jnp.stack([sy, sx]), jnp.stack([ty, tx]), method="linear")


def center_crop_resize(img: jnp.ndarray, out_size: int,
                       crop_pct: float = 0.875) -> jnp.ndarray:
    """Eval transform: resize(out/crop_pct) + center crop (reference
    datasets.py:152-160)."""
    H, W, C = img.shape
    scale_size = int(out_size / crop_pct)
    short = min(H, W)
    nh, nw = int(round(H * scale_size / short)), int(
        round(W * scale_size / short))
    img = jax.image.resize(img, (nh, nw, C), method="bicubic")
    y0 = (nh - out_size) // 2
    x0 = (nw - out_size) // 2
    return jax.lax.dynamic_slice(img, (y0, x0, 0), (out_size, out_size, C))


# ---------------------------------------------------------------------------
# Photometric primitives (0..255 float domain, PIL-equivalent)
# ---------------------------------------------------------------------------

def _blend(a, b, factor):
    return jnp.clip(b + (a - b) * factor, 0.0, 255.0)


def _grayscale(img):
    l = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    return jnp.broadcast_to(l[..., None], img.shape)


def brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def contrast(img, factor):
    mean = jnp.mean(_grayscale(img)[..., 0])
    return _blend(img, jnp.full_like(img, mean), factor)


def color(img, factor):
    return _blend(img, _grayscale(img), factor)


def sharpness(img, factor):
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    blur = jax.lax.conv_general_dilated(
        img[None].transpose(0, 3, 1, 2),
        jnp.broadcast_to(k[None, None], (img.shape[-1], 1, 3, 3)),
        (1, 1), "SAME", feature_group_count=img.shape[-1])[0].transpose(
            1, 2, 0)
    return _blend(img, blur, factor)


def invert(img):
    return 255.0 - img


def posterize(img, bits):
    shift = (8 - bits).astype(jnp.uint8)
    q = jnp.right_shift(img.astype(jnp.uint8), shift)
    return jnp.left_shift(q, shift).astype(jnp.float32)


def solarize(img, thresh):
    return jnp.where(img >= thresh, 255.0 - img, img)


def solarize_add(img, add):
    return jnp.where(img < 128.0, jnp.clip(img + add, 0, 255), img)


def autocontrast(img):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img - lo) * scale
    return jnp.where(hi > lo, jnp.clip(out, 0, 255), img)


EQ_KNOTS = 16


def equalize(img):
    """Per-channel histogram equalization as a piecewise-linear CDF map.

    Exact PIL equalize needs a 256-bin histogram (scatter) plus a per-pixel
    LUT lookup (gather) — both pathological on TPU (~600 ms/batch measured).
    Instead: estimate 17 quantile knots per channel from a strided pixel
    sample (one small batched sort), then map every pixel through the
    monotone piecewise-linear CDF with vectorized clip/sum — no gathers or
    scatters. Visually equivalent (cdf(x) agrees at the knots; segments are
    linearly interpolated)."""
    H, W, C = img.shape
    sub = img[::4, ::4, :].reshape(-1, C)                 # (S, C) sample
    qs = jnp.sort(sub, axis=0)                            # (S, C)
    S = qs.shape[0]
    # knot intensities at ranks j/K, j = 0..K
    ranks = jnp.clip((jnp.arange(EQ_KNOTS + 1) * (S - 1)) // EQ_KNOTS,
                     0, S - 1)
    knots = qs[ranks]                                     # (K+1, C)
    x = img.reshape(-1, 1, C)                             # (P, 1, C)
    lo = knots[:-1].reshape(1, EQ_KNOTS, C)
    hi = knots[1:].reshape(1, EQ_KNOTS, C)
    seg = jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-5), 0.0, 1.0)
    cdf = jnp.sum(seg, axis=1) / EQ_KNOTS                 # (P, C)
    return (cdf * 255.0).reshape(H, W, C)


# ---------------------------------------------------------------------------
# Geometric: one composed affine warp
# ---------------------------------------------------------------------------

def bilinear_sample(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                    fill: float = 128.0) -> jnp.ndarray:
    """Bilinear sample img (H, W, C) at float coords (sy, sx) of shape
    (Ho, Wo); out-of-bounds -> fill.

    Corner packing: the four bilinear taps of pixel (y, x) are rows
    (y, x), (y, x+1), (y+1, x), (y+1, x+1). We pre-build a packed array
    whose row i = concat of those four neighbors of pixel i (via cheap
    roll shifts), so ONE gather of a 4C-wide row fetches all taps —
    4x fewer gather descriptors and wider rows than per-tap gathers."""
    H, W, C = img.shape
    # neighbors via rolls (wrap rows are masked below via the oob check)
    imgh = img.astype(jnp.bfloat16)       # 0..255 integers exact in bf16
    xp = jnp.roll(imgh, -1, axis=1)
    yp = jnp.roll(imgh, -1, axis=0)
    xyp = jnp.roll(xp, -1, axis=0)
    packed = jnp.concatenate([imgh, xp, yp, xyp], axis=-1)    # (H, W, 4C)
    flat = packed.reshape(H * W, 4 * C)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    idx = (y0i * W + x0i).reshape(-1)
    rows = jnp.take(flat, idx, axis=0).astype(jnp.float32).reshape(
        *sy.shape, 4, C)
    v00, v01, v10, v11 = (rows[..., 0, :], rows[..., 1, :],
                          rows[..., 2, :], rows[..., 3, :])

    # out-of-bounds handling per tap (the roll wrap-around is also oob)
    def oob(yi, xi):
        return ((yi < 0) | (yi >= H) | (xi < 0) | (xi >= W))[..., None]

    yf = y0.astype(jnp.int32)
    xf = x0.astype(jnp.int32)
    v00 = jnp.where(oob(yf, xf), fill, v00)
    v01 = jnp.where(oob(yf, xf + 1), fill, v01)
    v10 = jnp.where(oob(yf + 1, xf), fill, v10)
    v11 = jnp.where(oob(yf + 1, xf + 1), fill, v11)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _resample_x(img: jnp.ndarray, scale, shift_per_row: jnp.ndarray,
                fill: float) -> jnp.ndarray:
    """Per-row 1-D linear resample: out[y, x] = in[y, scale*x + shift(y)].

    One take_along_axis with monotone per-row indices + one shifted copy —
    lowers ~17x faster on TPU than 2-D gather interpolation (8 vs 230 ms
    for a 256x224x224x3 batch, measured)."""
    H, W, C = img.shape
    x = jnp.arange(W, dtype=jnp.float32)[None, :]
    src = scale * x + shift_per_row[:, None]              # (H, W)
    k = jnp.floor(src)
    f = (src - k)[..., None]
    ki = k.astype(jnp.int32)
    oob0 = (ki < 0) | (ki >= W)
    oob1 = (ki + 1 < 0) | (ki + 1 >= W)
    t0 = jnp.take_along_axis(img, jnp.clip(ki, 0, W - 1)[..., None], axis=1)
    t1 = jnp.take_along_axis(img, jnp.clip(ki + 1, 0, W - 1)[..., None],
                             axis=1)
    t0 = jnp.where(oob0[..., None], fill, t0)
    t1 = jnp.where(oob1[..., None], fill, t1)
    return t0 * (1.0 - f) + t1 * f


def _resample_y(img: jnp.ndarray, scale, shift_per_col: jnp.ndarray,
                fill: float) -> jnp.ndarray:
    out = _resample_x(jnp.swapaxes(img, 0, 1), scale, shift_per_col, fill)
    return jnp.swapaxes(out, 0, 1)


_SHIFT_PAD = 128


def _row_shift_frac(img: jnp.ndarray, shift: jnp.ndarray,
                    fill: float) -> jnp.ndarray:
    """out[y, x] = in[y, x + shift(y)] with fractional (bilinear) shift,
    gather-free.

    Per-row dynamic indices force XLA's slow gather path under vmap
    (~45x slower, measured); instead the integer shift is decomposed into
    8 conditional power-of-two rolls — rolls have batch-shared shifts
    (fast lane moves) and the per-row choice is an elementwise select.
    |shift| must be < 127 (our op set maxes at 0.45 * 224 = 101).

    The rolls run in uint8 by default (4x less HBM traffic; round+clamp
    matches PIL u8 semantics, see _ROLL_U8 note above); the fractional
    interpolation is done in the input's float dtype either way."""
    H, W, C = img.shape
    out_dtype = img.dtype
    shift = jnp.clip(shift, -126.0, 125.0)
    k = jnp.floor(shift)
    f = (shift - k)[:, None, None]
    kp = (k.astype(jnp.int32) + _SHIFT_PAD)          # in [2, 253]

    if _ROLL_U8:
        img = jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)
        fill = round(fill)
    pad = jnp.full((H, _SHIFT_PAD, C), fill, img.dtype)
    x = jnp.concatenate([pad, img, pad], axis=1)     # (H, W + 256, C)
    x = jnp.roll(x, _SHIFT_PAD, axis=1)
    for j in range(8):
        bit = ((kp >> j) & 1).astype(bool)[:, None, None]
        x = jnp.where(bit, jnp.roll(x, -(1 << j), axis=1), x)
    s0 = x[:, _SHIFT_PAD:_SHIFT_PAD + W].astype(out_dtype)
    s1 = jnp.roll(x, -1, axis=1)[:, _SHIFT_PAD:_SHIFT_PAD + W] \
        .astype(out_dtype)
    return s0 * (1.0 - f) + s1 * f


def _col_shift_frac(img: jnp.ndarray, shift: jnp.ndarray,
                    fill: float) -> jnp.ndarray:
    out = _row_shift_frac(jnp.swapaxes(img, 0, 1), shift, fill)
    return jnp.swapaxes(out, 0, 1)


def affine_warp(img: jnp.ndarray, mat: jnp.ndarray,
                fill: float = 128.0) -> jnp.ndarray:
    """Apply a 2x3 inverse affine matrix (output->source coords, about the
    image center), bilinear, constant fill (PIL fillcolor=128).

    Decomposed into two separable passes (out = Rx(Ry(in))):
      y-pass:  y_src = g*y + rho*u + tau  (per-column shift, u = column)
               g = m11 - m10*m01/m00, rho = m10/m00, tau = m12 - rho*m02
      x-pass:  x_src = m00*x + m01*y + m02 (per-row shift)
    valid while |m00| > 0; our op set (rotate <= 30deg, shear <= 0.3,
    translate) keeps m00 >= 0.85. Each pass is a take_along_axis resample
    (see _resample_x) instead of a 2-D gather — ~17x faster on TPU.
    """
    H, W, C = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    m00, m01, m02 = mat[0, 0], mat[0, 1], mat[0, 2]
    m10, m11, m12 = mat[1, 0], mat[1, 1], mat[1, 2]
    m00s = jnp.where(jnp.abs(m00) < 0.25,
                     jnp.where(m00 < 0, -0.25, 0.25), m00)

    rho = m10 / m00s
    g = m11 - rho * m01
    tau = m12 - rho * m02

    # y-pass first: per-column shift over the column's centered coord
    xs = jnp.arange(W, dtype=jnp.float32) - cx
    shift_col = rho * xs + tau + cy - g * cy
    out = _resample_y(img, g, shift_col, fill)
    # x-pass: per-row shift over the row's centered coord
    ys = jnp.arange(H, dtype=jnp.float32) - cy
    shift_row = m01 * ys + m02 + cx - m00s * cx
    out = _resample_x(out, m00s, shift_row, fill)
    return out


# ---------------------------------------------------------------------------
# RandAugment (rand-m9-mstd0.5-inc1 default; reference datasets.py:137)
# ---------------------------------------------------------------------------

# op ids
_PHOTO_OPS = ("autocontrast", "equalize", "invert", "posterize", "solarize",
              "solarize_add", "color", "contrast", "brightness", "sharpness")
_GEO_OPS = ("rotate", "shear_x", "shear_y", "translate_x", "translate_y")
NUM_OPS = len(_PHOTO_OPS) + len(_GEO_OPS)


def _apply_photo_slot(img, op_idx, frac, enh_factor, enabled):
    """Apply one photometric slot: compute each candidate, select by index.
    (All candidates are cheap elementwise passes; geometric ops are handled
    separately so the image is resampled once.)

    frac: unsigned magnitude/10 (posterize / solarize / solarize-add);
    enh_factor: 1 + sign*frac*0.9 ('-inc1' enhancement mapping).
    """
    candidates = [
        autocontrast(img),
        equalize(img),
        invert(img),
        posterize(img, jnp.maximum(4 - jnp.round(frac * 4), 1).astype(
            jnp.int32)),                                   # inc1 variant
        solarize(img, 256.0 - frac * 256.0),               # inc1 variant
        solarize_add(img, frac * 110.0),
        color(img, enh_factor),
        contrast(img, enh_factor),
        brightness(img, enh_factor),
        sharpness(img, enh_factor),
    ]
    out = img
    for i, cand in enumerate(candidates):
        out = jnp.where(op_idx == i, cand, out)
    return jnp.where(enabled, out, img)


def rand_augment(rng, img: jnp.ndarray, *, magnitude: float = 9.0,
                 mag_std: float = 0.5, num_layers: int = 2,
                 apply_prob: float = 0.5) -> jnp.ndarray:
    """timm RandAugment for one image (float 0..255 HWC).

    Each of `num_layers` slots picks one of 15 ops uniformly and applies it
    with probability `apply_prob`; magnitude ~ N(magnitude, mag_std) clipped
    to [0, 10] ('mstd0.5'); enhancement/geometry magnitudes use the
    '-inc1' (increasing-severity) mappings with random sign.
    """
    for layer in range(num_layers):
        rng, k_op, k_m, k_sign, k_apply = jax.random.split(rng, 5)
        op_idx = jax.random.randint(k_op, (), 0, NUM_OPS)
        m = jnp.clip(magnitude + mag_std * jax.random.normal(k_m), 0.0, 10.0)
        sign = jnp.where(jax.random.bernoulli(k_sign, 0.5), 1.0, -1.0)
        enabled = jax.random.bernoulli(k_apply, apply_prob)
        frac = m / 10.0
        enh_factor = 1.0 + sign * frac * 0.9
        img = _apply_photo_slot(img, op_idx, frac, enh_factor, enabled)

        # geometric slot: pure-shear (scale-1) passes. take_along_axis with
        # scale-1 per-row indices hits a fast lowering (~8 ms/256-batch per
        # pass); scaled indices or 2-D gathers are 20-90x slower (measured).
        # rotate uses the Paeth 3-shear identity
        #   R(th) = ShearX(-tan th/2) . ShearY(sin th) . ShearX(-tan th/2)
        H, W = img.shape[0], img.shape[1]
        geo_id = op_idx - len(_PHOTO_OPS)
        on = enabled.astype(jnp.float32)
        th = sign * frac * (30.0 * math.pi / 180.0)
        shear = sign * frac * 0.3
        trans = sign * frac * 0.45

        is_rot = on * (geo_id == 0)
        sx1 = is_rot * -jnp.tan(th / 2.0) + on * (geo_id == 1) * shear
        sy_s = is_rot * jnp.sin(th) + on * (geo_id == 2) * shear
        sx2 = is_rot * -jnp.tan(th / 2.0)
        tx = on * (geo_id == 3) * trans * W
        ty = on * (geo_id == 4) * trans * H

        cy = (H - 1) / 2.0
        cx = (W - 1) / 2.0
        ys = jnp.arange(H, dtype=jnp.float32) - cy
        xs = jnp.arange(W, dtype=jnp.float32) - cx
        img = _row_shift_frac(img, sx1 * ys + tx, 128.0)
        img = _col_shift_frac(img, sy_s * xs + ty, 128.0)
        img = _row_shift_frac(img, sx2 * ys, 128.0)

    return img


# ---------------------------------------------------------------------------
# Color jitter / RandomErasing / normalize
# ---------------------------------------------------------------------------

def color_jitter(rng, img, strength: float = 0.4):
    """brightness/contrast/saturation each ~ U(1-s, 1+s) (torchvision
    ColorJitter as used via timm when auto_augment is off)."""
    kb, kc, ks = jax.random.split(rng, 3)
    img = brightness(img, jax.random.uniform(kb, (), minval=1 - strength,
                                             maxval=1 + strength))
    img = contrast(img, jax.random.uniform(kc, (), minval=1 - strength,
                                           maxval=1 + strength))
    img = color(img, jax.random.uniform(ks, (), minval=1 - strength,
                                        maxval=1 + strength))
    return img


def random_erasing(rng, img_norm: jnp.ndarray, *, prob: float = 0.25,
                   area=(0.02, 1 / 3), aspect=(0.3, 3.3)) -> jnp.ndarray:
    """timm RandomErasing mode='pixel' count=1: replace a random box of the
    *normalized* image with N(0,1) noise (reference datasets.py:141-147)."""
    H, W, C = img_norm.shape
    k_apply, k_area, k_ratio, k_y, k_x, k_noise = jax.random.split(rng, 6)
    apply = jax.random.bernoulli(k_apply, prob)
    a = jax.random.uniform(k_area, (), minval=area[0], maxval=area[1]) * H * W
    log_r = jax.random.uniform(k_ratio, (), minval=math.log(aspect[0]),
                               maxval=math.log(aspect[1]))
    r = jnp.exp(log_r)
    h = jnp.clip(jnp.sqrt(a * r), 1.0, H)
    w = jnp.clip(jnp.sqrt(a / r), 1.0, W)
    y0 = jax.random.uniform(k_y, ()) * (H - h)
    x0 = jax.random.uniform(k_x, ()) * (W - w)
    rows = jnp.arange(H, dtype=jnp.float32)[:, None]
    cols = jnp.arange(W, dtype=jnp.float32)[None, :]
    box = ((rows >= y0) & (rows < y0 + h) & (cols >= x0) & (cols < x0 + w))
    noise_dtype = jnp.bfloat16 if _ERASE_BF16 else jnp.float32
    noise = jax.random.normal(k_noise, img_norm.shape,
                              noise_dtype).astype(img_norm.dtype)
    out = jnp.where(box[..., None] & apply, noise, img_norm)
    return out


def normalize(img255: jnp.ndarray) -> jnp.ndarray:
    return (img255 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------
# Full batched pipelines
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("out_size", "use_randaug",
                                   "color_jitter_strength", "re_prob",
                                   "crop_scale", "hflip"))
def train_augment_batch(rng, images_u8: jnp.ndarray, *, out_size: int = 224,
                        use_randaug: bool = True,
                        color_jitter_strength: float = 0.4,
                        re_prob: float = 0.25,
                        crop_scale=(0.08, 1.0),
                        hflip: bool = True) -> jnp.ndarray:
    """uint8 staging batch (B, S, S, 3) -> augmented normalized float32
    (B, out, out, 3). The train transform of reference datasets.py:127-150."""
    B = images_u8.shape[0]
    rngs = jax.random.split(rng, B)

    def one(rng, img_u8):
        k_crop, k_flip, k_aug, k_er = jax.random.split(rng, 4)
        img = img_u8.astype(jnp.float32)
        img = random_resized_crop(k_crop, img, out_size,
                                  scale=crop_scale)
        if hflip:
            img = jnp.where(jax.random.bernoulli(k_flip, 0.5),
                            img[:, ::-1], img)
        if use_randaug:
            img = rand_augment(k_aug, img)
        else:
            img = color_jitter(k_aug, img, color_jitter_strength)
        img = normalize(img)
        img = random_erasing(k_er, img, prob=re_prob)
        return img

    return jax.vmap(one)(rngs, images_u8)


@partial(jax.jit, static_argnames=("out_size",))
def eval_preprocess_batch(images_u8: jnp.ndarray, *, out_size: int = 224
                          ) -> jnp.ndarray:
    """Eval transform (reference datasets.py:152-163): assumes the host
    already resized/center-cropped to staging; final resize + normalize."""
    imgs = images_u8.astype(jnp.float32)
    B, H, W, C = imgs.shape
    if (H, W) != (out_size, out_size):
        def one(img):
            return center_crop_resize(img, out_size)
        imgs = jax.vmap(one)(imgs)
    return normalize(imgs)
