"""Geometric augmentation fidelity: the shear-pass machinery must agree
with PIL's affine transforms on smooth images (the distribution RandAugment
was tuned on)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofb_tpu.ops.augment import (_col_shift_frac, _row_shift_frac,
                                 affine_warp)


def smooth_image(h=64, w=64):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([
        128 + 80 * np.sin(xx / 9.0),
        128 + 80 * np.cos(yy / 7.0),
        128 + 60 * np.sin((xx + yy) / 11.0),
    ], -1).astype(np.float32)
    return img


def test_row_shift_matches_pil_translate():
    from PIL import Image
    img = smooth_image()
    shift = 5.0
    ours = np.asarray(_row_shift_frac(jnp.asarray(img),
                                      jnp.full(64, shift), 128.0))
    pil = Image.fromarray(img.astype(np.uint8)).transform(
        (64, 64), Image.AFFINE, (1, 0, shift, 0, 1, 0),
        resample=Image.BILINEAR, fillcolor=(128, 128, 128))
    ref = np.asarray(pil).astype(np.float32)
    inner = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert inner.mean() < 2.0


def test_three_shear_rotation_matches_pil_rotate():
    from PIL import Image
    img = smooth_image()
    theta = 20.0 * np.pi / 180.0
    # Paeth: R = ShearX(-tan t/2) . ShearY(sin t) . ShearX(-tan t/2),
    # passes applied in that order (see ops/augment.py rand_augment)
    cy = cx = (64 - 1) / 2.0
    ys = jnp.arange(64, dtype=jnp.float32) - cy
    xs = jnp.arange(64, dtype=jnp.float32) - cx
    x = jnp.asarray(img)
    a = -np.tan(theta / 2.0)
    x = _row_shift_frac(x, a * ys, 128.0)
    x = _col_shift_frac(x, np.sin(theta) * xs, 128.0)
    x = _row_shift_frac(x, a * ys, 128.0)
    ours = np.asarray(x)

    # our mapping src = R(+theta) . out corresponds to PIL's
    # counterclockwise rotate(+deg)
    pil = Image.fromarray(img.astype(np.uint8)).rotate(
        theta * 180 / np.pi, resample=Image.BILINEAR,
        fillcolor=(128, 128, 128))
    ref = np.asarray(pil).astype(np.float32)
    # compare the central region (borders differ in fill bleed)
    d = np.abs(ours[16:-16, 16:-16] - ref[16:-16, 16:-16])
    assert d.mean() < 4.0, d.mean()


def test_affine_warp_two_pass_matches_pil():
    from PIL import Image
    img = smooth_image()
    mat = np.array([[np.cos(0.3), -np.sin(0.3), 2.0],
                    [np.sin(0.3), np.cos(0.3), -1.0]], np.float32)
    ours = np.asarray(affine_warp(jnp.asarray(img), jnp.asarray(mat), 128.0))
    # PIL's AFFINE data maps output->input about the top-left corner;
    # convert our center-origin matrix
    c = (64 - 1) / 2.0
    a, b, tx0 = mat[0]
    d, e, ty0 = mat[1]
    tx = tx0 + c - a * c - b * c
    ty = ty0 + c - d * c - e * c
    pil = Image.fromarray(img.astype(np.uint8)).transform(
        (64, 64), Image.AFFINE, (a, b, tx, d, e, ty),
        resample=Image.BILINEAR, fillcolor=(128, 128, 128))
    ref = np.asarray(pil).astype(np.float32)
    dcent = np.abs(ours[16:-16, 16:-16] - ref[16:-16, 16:-16])
    assert dcent.mean() < 4.0, dcent.mean()


def test_u8_roll_path_matches_f32_rolls(monkeypatch):
    """The default uint8-roll geometry (4x less HBM traffic, BENCH round 3)
    must track the float32 roll path within ~1 uint8 LSB."""
    from ofb_tpu.ops import augment as A

    img = jnp.asarray(np.random.RandomState(3).rand(48, 48, 3) * 255.0,
                      jnp.float32)
    ys = jnp.arange(48, dtype=jnp.float32) - 23.5
    shift = 0.2 * ys + 7.3
    monkeypatch.setattr(A, "_ROLL_U8", True)
    out_u8 = np.asarray(A._row_shift_frac(img, shift, 128.0))
    monkeypatch.setattr(A, "_ROLL_U8", False)
    out_f32 = np.asarray(A._row_shift_frac(img, shift, 128.0))
    d = np.abs(out_u8 - out_f32)
    assert d.mean() < 0.5 and np.quantile(d, 0.99) < 1.0, \
        (d.mean(), np.quantile(d, 0.99))
