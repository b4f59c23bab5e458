"""Ablation breakdown of the device-side train augment program.

The fused end-to-end path (uint8 staging -> device augment -> search step
in one XLA program) runs at 961 img/s vs 2011 img/s for the step alone —
the augment program is roughly half the end-to-end budget. Before
optimizing anything, measure where its time goes (the same discipline
that earned the round-2 RandAugment rewrite its 5759 -> 157 ms/batch):

  variants: full pipeline, -erasing, -geometry, -photometric, crop only,
  plus one optimization CANDIDATE (bf16 geometry resampling — the
  conditional-roll shear passes are bandwidth-bound, so halving bytes
  moved should cut their cost; equivalence is tolerance-checked here).

Reference augment semantics: /root/reference/datasets.py:127-150.

Usage: python scripts/augment_breakdown.py [--cpu] [--batch 256]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--stage", type=int, default=256,
                    help="host staging resolution (uint8 square)")
    ap.add_argument("--out-size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ofb_tpu.ops import augment as A

    B, S, O = args.batch, args.stage, args.out_size
    rng = np.random.RandomState(0)
    batch_np = rng.randint(0, 256, size=(B, S, S, 3), dtype=np.uint8)
    batch = jnp.asarray(batch_np)
    key = jax.random.PRNGKey(0)

    def geo_passes(img, sx1, sy_s, sx2, tx, ty, dtype=None):
        H, W = img.shape[0], img.shape[1]
        cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
        ys = jnp.arange(H, dtype=jnp.float32) - cy
        xs = jnp.arange(W, dtype=jnp.float32) - cx
        orig = img.dtype
        if dtype is not None:
            img = img.astype(dtype)
        img = A._row_shift_frac(img, sx1 * ys + tx, 128.0)
        img = A._col_shift_frac(img, sy_s * xs + ty, 128.0)
        img = A._row_shift_frac(img, sx2 * ys, 128.0)
        return img.astype(orig)

    def ra_variant(rng, img, photo=True, geo=True, geo_dtype=None):
        """rand_augment with the photometric / geometric slots toggled,
        mirroring ops/augment.py rand_augment exactly."""
        import math
        for _ in range(2):
            rng, k_op, k_m, k_sign, k_apply = jax.random.split(rng, 5)
            op_idx = jax.random.randint(k_op, (), 0, A.NUM_OPS)
            m = jnp.clip(9.0 + 0.5 * jax.random.normal(k_m), 0.0, 10.0)
            sign = jnp.where(jax.random.bernoulli(k_sign, 0.5), 1.0, -1.0)
            enabled = jax.random.bernoulli(k_apply, 0.5)
            frac = m / 10.0
            enh = 1.0 + sign * frac * 0.9
            if photo:
                img = A._apply_photo_slot(img, op_idx, frac, enh, enabled)
            if geo:
                H, W = img.shape[0], img.shape[1]
                geo_id = op_idx - len(A._PHOTO_OPS)
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
                img = geo_passes(img, sx1, sy_s, sx2, tx, ty, dtype=geo_dtype)
        return img

    def make_pipeline(crop=True, flip=True, photo=True, geo=True,
                      erase=True, geo_dtype=None):
        def one(rng, img_u8):
            k_crop, k_flip, k_aug, k_er = jax.random.split(rng, 4)
            img = img_u8.astype(jnp.float32)
            if crop:
                img = A.random_resized_crop(k_crop, img, O, scale=(0.08, 1.0))
            else:
                img = A.center_crop_resize(img, O)
            if flip:
                img = jnp.where(jax.random.bernoulli(k_flip, 0.5),
                                img[:, ::-1], img)
            if photo or geo:
                img = ra_variant(k_aug, img, photo=photo, geo=geo,
                                 geo_dtype=geo_dtype)
            img = A.normalize(img)
            if erase:
                img = A.random_erasing(k_er, img, prob=0.25)
            return img

        @jax.jit
        def run(key, batch):
            rngs = jax.random.split(key, batch.shape[0])
            return jax.vmap(one)(rngs, batch)
        return run

    variants = [
        ("full (crop+flip+RA+erase)", dict()),
        ("- erasing", dict(erase=False)),
        ("- RA geometry (photo only)", dict(geo=False)),
        ("- RA photometric (geo only)", dict(photo=False)),
        ("- RA entirely", dict(photo=False, geo=False)),
        ("crop only (no flip/RA/erase)",
         dict(flip=False, photo=False, geo=False, erase=False)),
        ("resize only (eval-like)",
         dict(crop=False, flip=False, photo=False, geo=False, erase=False)),
        ("CANDIDATE: bf16 geometry", dict(geo_dtype=jnp.bfloat16)),
    ]

    def bench(run):
        out = run(key, batch)
        float(out.sum())                       # sync via host readback
        t0 = time.time()
        for i in range(args.iters):
            out = run(jax.random.fold_in(key, i), batch)
        float(out.sum())
        return (time.time() - t0) / args.iters * 1e3

    results = {}
    for name, kw in variants:
        run = make_pipeline(**kw)
        ms = bench(run)
        results[name] = ms
        print(f"{name:38s} {ms:8.1f} ms/batch  "
              f"({B / ms * 1e3:7.1f} img/s)", flush=True)

    # equivalence check for the bf16 candidate (same rng -> same ops; the
    # only delta is resample precision). uint8-domain tolerance: <=1 LSB
    # mean, a few LSB max is acceptable for augmentation.
    ref = make_pipeline()(key, batch)
    cand = make_pipeline(geo_dtype=jnp.bfloat16)(key, batch)
    import numpy as np
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(cand, np.float32))
    # normalized domain: 1 uint8 LSB ~= (1/255)/std ~= 0.017
    print(f"bf16-geometry delta vs f32 (normalized units): "
          f"mean {d.mean():.5f}  p99 {np.quantile(d, 0.99):.5f}  "
          f"max {d.max():.5f}")


if __name__ == "__main__":
    main()
