"""Hand-computed numerics for the adaptive one-hot loss and FLOPs loss —
direct formula parity with reference models/base_model.py:31-86."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofb_tpu.core.losses import _cell_loss, sparsity_losses
from ofb_tpu.models.mim_vit import init_alphas, init_mim_params
from ofb_tpu.models.search_space import ArchState, SearchSpace
from ofb_tpu.models.vit import ModelCfg
from ofb_tpu.ops.flops import flops_loss, model_flops


def test_cell_loss_matches_hand_formula():
    """entropy = -sum p log p over active cells; variance term
    tan(pi/2 - pi * sigma/target) / n_active (reference base_model.py:60-70)."""
    alpha = np.array([0.3, 1.2, -0.5, 0.8], np.float32)
    switch = np.array([True, True, False, True])

    a = alpha[switch]
    p = np.exp(a - a.max())
    p = p / p.sum()
    n = switch.sum()
    entropy = -(p * np.log(p)).sum()
    sigma = ((p - p.mean()) ** 2).sum()
    target = 1.0 - 1.0 / n
    expected = entropy + math.tan(math.pi / 2 - math.pi * sigma / target) / n

    got = float(_cell_loss(jnp.asarray(alpha), jnp.asarray(switch),
                           entropy=True, var=True, divide_var_by_n=True))
    assert got == pytest.approx(expected, rel=1e-4)


def test_cell_loss_patch_variant_undivided():
    """The patch dimension's variance term is NOT divided by n_active
    (reference base_model.py:50 vs :70)."""
    alpha = np.array([0.1, 0.9, 0.4], np.float32)
    switch = np.array([True, True, True])
    a = _cell_loss(jnp.asarray(alpha), jnp.asarray(switch), entropy=True,
                   var=True, divide_var_by_n=False)
    b = _cell_loss(jnp.asarray(alpha), jnp.asarray(switch), entropy=True,
                   var=True, divide_var_by_n=True)
    p = np.exp(alpha - alpha.max()); p = p / p.sum()
    ent = -(p * np.log(p)).sum()
    # tan terms relate exactly by the 1/n factor
    assert (float(a) - ent) == pytest.approx(3 * (float(b) - ent), rel=1e-4)


def test_converged_module_contributes_zero():
    alpha = np.array([5.0, 0.0], np.float32)
    switch = np.array([True, False])
    got = float(_cell_loss(jnp.asarray(alpha), jnp.asarray(switch),
                           entropy=True, var=True, divide_var_by_n=True))
    assert got == 0.0


def test_score_norm_weights_attn_4e4_others_1e4():
    """Attention score-norm uses 4e-4, embed/mlp 1e-4
    (reference base_model.py:74-77)."""
    cfg = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                   depth=1, num_heads=2, mlp_ratio=2.0)
    space = SearchSpace.build(32, 1, 2, cfg.hidden, cfg.num_patches,
                              patch_search=True)
    params = init_mim_params(jax.random.PRNGKey(0), cfg, space)
    alphas = init_alphas(jax.random.PRNGKey(1), space)
    arch = ArchState.create(space)

    with_norm = sparsity_losses(params, alphas, arch, space, norm=True)
    no_norm = sparsity_losses(params, alphas, arch, space, norm=False)

    def sig_sum(x):
        return float(jax.nn.sigmoid(jnp.asarray(x, jnp.float32)).sum())

    attn_term = float(with_norm["attn"] - no_norm["attn"])
    assert attn_term == pytest.approx(
        4e-4 * sig_sum(params["blocks"][0]["attn"]["score"]), rel=1e-4)
    embed_term = float(with_norm["embed"] - no_norm["embed"])
    assert embed_term == pytest.approx(
        1e-4 * sig_sum(params["patch_embed"]["score"]), rel=1e-4)
    mlp_term = float(with_norm["mlp"] - no_norm["mlp"])
    assert mlp_term == pytest.approx(
        1e-4 * sig_sum(params["blocks"][0]["mlp"]["score"]), rel=1e-4)


def test_flops_loss_formula():
    """flops_loss = ((searched - target) / total)^2
    (reference base_model.py:31-35)."""
    cfg = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                   depth=1, num_heads=2, mlp_ratio=2.0)
    space = SearchSpace.build(32, 1, 2, cfg.hidden, cfg.num_patches,
                              patch_search=True)
    alphas = init_alphas(jax.random.PRNGKey(0), space)
    arch = ArchState.create(space)
    total, searched = model_flops(alphas, arch, space, cfg)
    target = 0.7 * float(searched)
    loss, s2 = flops_loss(alphas, arch, space, cfg, target)
    assert float(s2) == pytest.approx(float(searched))
    expected = ((float(searched) - target) / float(total)) ** 2
    assert float(loss) == pytest.approx(expected, rel=1e-5)
