"""Dense Swin family: forward shapes, window round-trip, shifted mask."""

import numpy as np
import jax
import jax.numpy as jnp

from ofb_tpu.models.swin import (SwinCfg, init_swin_params,
                                 relative_position_index,
                                 shifted_window_mask, swin_forward,
                                 window_partition, window_reverse)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_range():
    idx = relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2
    assert (np.diag(idx) == idx[0, 0]).all()     # zero offset everywhere


def test_shifted_mask_blocks_cross_regions():
    m = shifted_window_mask(8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (np.diagonal(m, axis1=1, axis2=2) == 0).all()
    assert (m <= 0).all() and (m < 0).any()


def test_swin_tiny_like_forward():
    cfg = SwinCfg(img_size=32, patch_size=2, num_classes=10, embed_dim=24,
                  depths=(1, 1), num_heads=(2, 4), window=4,
                  drop_path_rate=0.1)
    params = init_swin_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = swin_forward(params, x, cfg, compute_dtype=jnp.float32)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()
    # train mode with drop-path rng
    lt = swin_forward(params, x, cfg, train=True,
                      rng=jax.random.PRNGKey(2), compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(lt)).all()


def test_swin_registry():
    from ofb_tpu.models.registry import create_model
    b = create_model("swin_tiny_patch4_window7_224", num_classes=10)
    assert b.cfg.depths == (2, 2, 6, 2)


def test_window_pack_equivalence():
    """OFB_SWIN_PACK=G (block-diagonal packed window attention) must be
    numerically equivalent to the unpacked forward, incl. shifted blocks
    with masks and the nW=1 last stage (packs across images)."""
    import os
    from ofb_tpu.models.swin import SwinCfg, init_swin_params, swin_forward
    cfg = SwinCfg(img_size=56, patch_size=4, num_classes=7, embed_dim=16,
                  depths=(2, 2), num_heads=(2, 4), window=7,
                  drop_path_rate=0.0)
    params = init_swin_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 56, 56, 3))
    os.environ["OFB_SWIN_PACK"] = "1"
    try:
        base = np.asarray(swin_forward(params, x, cfg, train=False,
                                       compute_dtype=jnp.float32))
    finally:
        os.environ.pop("OFB_SWIN_PACK", None)
    for g in (2, 4):
        os.environ["OFB_SWIN_PACK"] = str(g)
        try:
            packed = np.asarray(swin_forward(params, x, cfg, train=False,
                                             compute_dtype=jnp.float32))
        finally:
            os.environ.pop("OFB_SWIN_PACK", None)
        np.testing.assert_allclose(packed, base, atol=2e-5, rtol=1e-5)
