"""Model forward tests: dense ViT, searchable MIM ViT, PMIM ops, FLOPs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofb_tpu.models.search_space import ArchState, SearchSpace
from ofb_tpu.models.vit import ModelCfg, dense_flops, init_vit_params, \
    vit_forward
from ofb_tpu.models.mim_vit import init_alphas, init_mim_params, mim_forward
from ofb_tpu.ops import pmim
from ofb_tpu.ops.flops import model_flops


TINY = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                depth=2, num_heads=2, mlp_ratio=2.0, drop_path_rate=0.1)


def tiny_space(**kw):
    return SearchSpace.build(TINY.embed_dim, TINY.depth, TINY.num_heads,
                             TINY.hidden, TINY.num_patches,
                             patch_search=True, **kw)


def test_dense_vit_forward_shapes():
    key = jax.random.PRNGKey(0)
    params = init_vit_params(key, TINY)
    x = jax.random.normal(key, (2, 32, 32, 3))
    logits = vit_forward(params, x, TINY, compute_dtype=jnp.float32)
    assert logits.shape == (2, 10)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.array(logits)).all()


def test_dense_vit_distilled_train_and_eval():
    cfg = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                   depth=1, num_heads=2, distilled=True)
    key = jax.random.PRNGKey(1)
    params = init_vit_params(key, cfg)
    x = jax.random.normal(key, (2, 32, 32, 3))
    out = vit_forward(params, x, cfg, train=True, rng=key,
                      compute_dtype=jnp.float32)
    assert isinstance(out, tuple) and out[0].shape == (2, 10)
    avg = vit_forward(params, x, cfg, compute_dtype=jnp.float32)
    assert avg.shape == (2, 10)


def test_mim_forward_search_mode():
    key = jax.random.PRNGKey(0)
    space = tiny_space()
    params = init_mim_params(key, TINY, space)
    alphas = init_alphas(key, space)
    arch = ArchState.create(space)
    x = jax.random.uniform(key, (2, 32, 32, 3))
    out = mim_forward(params, alphas, arch, x, TINY, space, train=True,
                      use_mim=True, keep_ratio=jnp.asarray(0.8),
                      rng=key, compute_dtype=jnp.float32)
    assert out.logits.shape == (2, 10)
    assert np.isfinite(float(out.decoder_loss))
    assert float(out.decoder_loss) > 0.0


def test_mim_forward_eval_no_decoder():
    key = jax.random.PRNGKey(0)
    space = tiny_space()
    params = init_mim_params(key, TINY, space)
    alphas = init_alphas(key, space)
    arch = ArchState.create(space)
    x = jax.random.uniform(key, (2, 32, 32, 3))
    out = mim_forward(params, alphas, arch, x, TINY, space, train=False,
                      use_mim=False, compute_dtype=jnp.float32)
    assert float(out.decoder_loss) == 0.0
    assert np.isfinite(np.array(out.logits)).all()


def test_mim_forward_jits_and_grads_flow_to_alpha_and_score():
    key = jax.random.PRNGKey(0)
    space = tiny_space()
    params = init_mim_params(key, TINY, space)
    alphas = init_alphas(key, space)
    arch = ArchState.create(space)
    x = jax.random.uniform(key, (2, 32, 32, 3))

    def loss_fn(params, alphas):
        out = mim_forward(params, alphas, arch, x, TINY, space, train=True,
                          use_mim=True, keep_ratio=jnp.asarray(0.8),
                          rng=key, compute_dtype=jnp.float32)
        return jnp.mean(out.logits ** 2) + out.decoder_loss

    g_p, g_a = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(params, alphas)
    # gates entangle alpha and score into the data path -> nonzero grads
    assert np.abs(np.array(g_a["embed"])).sum() > 0
    assert np.abs(np.array(g_a["blocks"][0]["attn"])).sum() > 0
    assert np.abs(np.array(g_a["blocks"][0]["mlp"])).sum() > 0
    assert np.abs(np.array(g_p["patch_embed"]["score"])).sum() > 0
    assert np.abs(np.array(g_p["blocks"][0]["attn"]["score"])).sum() > 0


def test_norm_targets_matches_torch_avgpool():
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 16, 3).astype(np.float32)
    ours = pmim.norm_targets(jnp.asarray(img), 7)

    t = torch.tensor(img.transpose(0, 3, 1, 2))
    tc = torch.ones_like(t)
    mean = F.avg_pool2d(t, 7, stride=1, padding=3, count_include_pad=False)
    sqm = F.avg_pool2d(t ** 2, 7, stride=1, padding=3,
                       count_include_pad=False)
    cnt = F.avg_pool2d(tc, 7, stride=1, padding=3,
                       count_include_pad=True) * 49
    var = (sqm - mean ** 2) * (cnt / (cnt - 1))
    var = torch.clamp(var, min=0.0)
    ref = ((t - mean) / (var + 1e-6) ** 0.5).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.array(ours), ref, atol=1e-4)


def test_pixel_shuffle_matches_torch():
    import torch
    rng = np.random.RandomState(0)
    x = rng.rand(2, 3, 3, 12).astype(np.float32)  # C_out = 12/4 = 3, r=2
    ours = pmim.pixel_shuffle_nhwc(jnp.asarray(x), 2)
    t = torch.pixel_shuffle(torch.tensor(x.transpose(0, 3, 1, 2)), 2)
    np.testing.assert_allclose(np.array(ours),
                               t.numpy().transpose(0, 2, 3, 1), atol=1e-6)


def test_random_token_mask_counts():
    mask = pmim.random_token_mask(jax.random.PRNGKey(0), 4, 16,
                                  jnp.asarray(12))
    assert mask.shape == (4, 16)
    np.testing.assert_array_equal(np.array(mask.sum(axis=1)), 4 * [4])
    # keep == all -> no mask
    mask2 = pmim.random_token_mask(jax.random.PRNGKey(0), 4, 16,
                                   jnp.asarray(16))
    assert float(mask2.sum()) == 0.0


def test_flops_model_dense_limit():
    """With every cell active and uniform alphas the searched FLOPs are below
    total; with alpha concentrated on the full-ratio cells searched ~= total."""
    space = tiny_space()
    arch = ArchState.create(space)
    key = jax.random.PRNGKey(0)
    alphas = init_alphas(key, space)
    total, searched = model_flops(alphas, arch, space, TINY)
    assert float(searched) < float(total)

    # concentrate all mass on the last (full) cell of each dim
    big = 50.0
    alphas_full = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), alphas)
    alphas_full["embed"] = alphas_full["embed"].at[-1].set(big)
    alphas_full["patch"] = alphas_full["patch"].at[-1].set(big)
    for b in alphas_full["blocks"]:
        b["attn"] = b["attn"].at[-1, -1].set(big)
        b["mlp"] = b["mlp"].at[-1].set(big)
    total2, searched2 = model_flops(alphas_full, arch, space, TINY)
    np.testing.assert_allclose(float(searched2), float(total2), rtol=1e-3)
    # dense analytic flops agrees with the 'total' channel of the model
    np.testing.assert_allclose(float(total2), dense_flops(TINY), rtol=1e-6)


def test_patchify_layout():
    img = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    toks = pmim.patchify(jnp.asarray(img), 4)
    assert toks.shape == (2, 4, 48)


def test_mim_forward_no_mae():
    """BASELINE config 2: bi-mask search without PMIM (--no-mae).
    No mask_token/decoder params; decoder loss exactly 0."""
    key = jax.random.PRNGKey(0)
    space = tiny_space()
    from ofb_tpu.models.mim_vit import init_mim_params as imp
    params = imp(key, TINY, space, mae=False)
    assert "mask_token" not in params and "decoder" not in params
    alphas = init_alphas(key, space)
    arch = ArchState.create(space)
    x = jax.random.uniform(key, (2, 32, 32, 3))
    out = mim_forward(params, alphas, arch, x, TINY, space, train=True,
                      use_mim=True, keep_ratio=jnp.asarray(0.8),
                      rng=key, compute_dtype=jnp.float32)
    assert float(out.decoder_loss) == 0.0
    assert np.isfinite(np.asarray(out.logits)).all()


def test_registry_stock_zoo_parity():
    """Every stock factory the reference registers
    (vision_transformer.py:1058-1310, minus the torchvision-hybrid
    vit_*_resnet* family) exists here with matching head/geometry."""
    from ofb_tpu.models.registry import create_model, list_models
    names = list_models()
    ref_stock = [
        "vit_small_patch16_224", "vit_base_patch16_224",
        "vit_base_patch32_224", "vit_base_patch16_384",
        "vit_base_patch32_384", "vit_large_patch16_224",
        "vit_large_patch32_224", "vit_large_patch16_384",
        "vit_large_patch32_384", "vit_base_patch16_224_in21k",
        "vit_base_patch32_224_in21k", "vit_large_patch16_224_in21k",
        "vit_large_patch32_224_in21k", "vit_huge_patch14_224_in21k",
        "vit_deit_tiny_patch16_224", "vit_deit_small_patch16_224",
        "vit_deit_base_patch16_224", "vit_deit_base_patch16_384",
        "vit_deit_tiny_distilled_patch16_224",
        "vit_deit_small_distilled_patch16_224",
        "vit_deit_base_distilled_patch16_224",
        "vit_deit_base_distilled_patch16_384",
        "vit_base_patch16_224_miil_in21k", "vit_base_patch16_224_miil",
    ]
    missing = [n for n in ref_stock if n not in names]
    assert not missing, missing
    b = create_model("vit_base_patch16_224_in21k")
    assert b.cfg.num_classes == 21843
    assert b.cfg.representation_size == 768
    assert create_model("vit_base_patch16_224_miil").cfg.qkv_bias is False
    assert create_model("vit_base_patch16_224_miil_in21k"
                        ).cfg.num_classes == 11221
    d = create_model("vit_deit_base_distilled_patch16_384")
    assert d.cfg.distilled and d.cfg.img_size == 384


def test_pre_logits_and_no_qkv_bias_forward():
    """in21k (tanh pre-logits head) and MIIL (bias-free qkv) variants run."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 32, 32, 3))
    for kw in (dict(representation_size=24), dict(qkv_bias=False)):
        cfg = ModelCfg(img_size=32, patch_size=8, num_classes=7,
                       embed_dim=24, depth=1, num_heads=2, **kw)
        params = init_vit_params(key, cfg)
        if "representation_size" in kw:
            assert "pre_logits" in params
        else:
            assert "bias" not in params["blocks"][0]["attn"]["qkv"]
        logits = vit_forward(params, x, cfg, compute_dtype=jnp.float32)
        assert logits.shape == (2, 7)
        assert np.isfinite(np.asarray(logits)).all()


def test_dense_flops_respects_block_overrides():
    """dense_flops must account pruned per-block dims (qkv term is D x 3Hhd,
    not (Hhd)^2 x 3 — they differ once a block's width is trimmed)."""
    base = dense_flops(TINY)
    trimmed = ModelCfg(img_size=32, patch_size=8, num_classes=10,
                       embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
                       block_overrides=((1, 8, 16), (2, 16, 64)))
    assert dense_flops(trimmed) < base


def test_window_sum_cumsum_matches_reduce_window():
    """The opt-in integral-image box filter (OFB_BOX_CUMSUM=1; measured
    slower, so the separable reduce_window stays default) must match the
    reduce_window path within fp32 cumsum tolerance at the PMIM window
    size."""
    x = jnp.asarray(np.random.RandomState(5).randn(2, 96, 96, 3)
                    .astype(np.float32))
    for k in (3, 4, 46, 47):   # even k: SAME pad is (k-1)//2 before, k//2 after
        a = np.asarray(pmim._window_sum_reduce(x, k))
        b = np.asarray(pmim._window_sum_cumsum(x, k))
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_gate_fold_no_qkv_bias():
    """Default-on gate folding must handle qkv_bias=False supernets
    (the MIIL config family)."""
    cfg = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                   depth=2, num_heads=2, mlp_ratio=2.0, qkv_bias=False)
    space = SearchSpace.build(cfg.embed_dim, cfg.depth, cfg.num_heads,
                              cfg.hidden, cfg.num_patches, patch_search=True)
    key = jax.random.PRNGKey(7)
    params = init_mim_params(key, cfg, space)
    assert "bias" not in params["blocks"][0]["attn"]["qkv"]
    alphas = init_alphas(key, space)
    arch = ArchState.create(space)
    x = jax.random.uniform(key, (2, 32, 32, 3))
    out = mim_forward(params, alphas, arch, x, cfg, space, train=True,
                      use_mim=True, keep_ratio=jnp.asarray(0.8), rng=key,
                      compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out.logits)).all()


def test_window_sum_matmul_matches_reduce_window():
    """The banded-matmul (MXU) box filter must match the separable
    reduce_window path exactly for odd and even k."""
    from ofb_tpu.ops import pmim
    x = jnp.asarray(np.random.RandomState(11).randn(2, 48, 40, 3)
                    .astype(np.float32))
    for k in (7, 8, 47):
        a = np.asarray(pmim._window_sum_reduce(x, k))
        b = np.asarray(pmim._window_sum_matmul(x, k))
        np.testing.assert_allclose(a, b, atol=2e-4)
