"""Unit tests for ratio grids, mask banks and gate math — the seams the
reference exposes (SURVEY §4): mask construction per grid
(reference models/layers.py:150-153, 428-430, 458-462, 819-822), the
softmax-over-active-cells -inf trick (:179-181), and rank-restore gather
logic (:186-191, 499-506)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofb_tpu.models.search_space import (
    ArchState, AttnSpace, DimSpace, PatchSpace, SearchSpace,
    embed_ratio_grid, head_num_grid, mlp_hidden_grid, patch_ratio_grid,
    qkv_channel_grid)
from ofb_tpu.ops import gates as G


def test_grids_match_reference_deit_small():
    # DeiT-S: D=384, H=6, d=64, hidden=1536
    er = embed_ratio_grid(384)
    assert er[0] == 192 / 384 and er[-1] == 1.0 and len(er) == 17
    assert head_num_grid(6) == (2, 4, 6)
    cr = qkv_channel_grid(64)
    assert cr == tuple(i / 64 for i in range(16, 65, 8))
    mr = mlp_hidden_grid(1536)
    assert mr == tuple(i / 1536 for i in range(384, 1537, 192))
    assert patch_ratio_grid() == (0.5, 0.625, 0.75, 0.875, 1.0)


def test_mask_banks_are_prefix_masks():
    ds = DimSpace(32, embed_ratio_grid(32))
    bank = ds.mask_bank
    assert bank.shape == (len(ds.ratios), 32)
    for i, r in enumerate(ds.ratios):
        k = int(r * 32)
        assert bank[i, :k].sum() == k and bank[i, k:].sum() == 0
    np.testing.assert_allclose(bank.sum(axis=1), ds.cell_sizes)


def test_attn_mask_bank_joint():
    sp = AttnSpace.build(6, 64)
    bank = sp.mask_bank
    kh, kc = sp.num_cells
    assert bank.shape == (kh, 6, kc, 64)
    # cell sizes equal bank sums
    sums = bank.sum(axis=(1, 3))
    np.testing.assert_allclose(sums, sp.cell_sizes)


def test_masked_softmax_inactive_cells_zero():
    alpha = jnp.array([1.0, 2.0, 3.0, 4.0])
    switch = jnp.array([True, False, True, True])
    p = G.masked_softmax(alpha, switch)
    assert float(p[1]) == 0.0
    np.testing.assert_allclose(float(p.sum()), 1.0, rtol=1e-6)
    # equals softmax over the active subset
    ref = jax.nn.softmax(jnp.array([1.0, 3.0, 4.0]))
    np.testing.assert_allclose(np.array(p)[np.array([0, 2, 3])],
                               np.array(ref), rtol=1e-6)


def test_rank_restore_1d_places_mask_by_score_rank():
    # sorted-domain values are non-increasing; the highest-score channel
    # must receive the rank-0 value
    vals = jnp.array([1.0, 0.8, 0.5, 0.0])
    score = jnp.array([0.1, 3.0, -1.0, 0.5])
    hard = jnp.ones(4)
    out = G.rank_restore_1d(vals, score, hard)
    # score ranks desc: ch1(3.0)->0, ch3(0.5)->1, ch0(0.1)->2, ch2(-1)->3
    np.testing.assert_allclose(np.array(out),
                               np.array([0.5, 1.0, 0.0, 0.8]))


def test_rank_restore_1d_hard_dead_channels_get_tail():
    vals = jnp.array([1.0, 1.0, 0.0, 0.0])
    score = jnp.array([5.0, 4.0, 3.0, 2.0])
    hard = jnp.array([0.0, 1.0, 1.0, 1.0])  # channel 0 dead despite top score
    out = G.rank_restore_1d(vals, score, hard)
    assert float(out[0]) == 0.0          # dead -> tail rank -> zero value
    assert float(out[1]) == 1.0 and float(out[2]) == 1.0


def test_rank_restore_attn_head_and_channel():
    H, d = 2, 3
    vals = jnp.array([[1.0, 0.5, 0.0],
                      [0.2, 0.0, 0.0]])    # head-rank-0 row stronger
    # head 1 has larger total sigmoid score -> head rank 0
    score = jnp.array([[0.0, -1.0, -2.0],
                       [5.0, 4.0, 3.0]])
    hard = jnp.ones((H, d))
    out = G.rank_restore_attn(vals, score, hard)
    # head 1 gets row 0 of vals, in its own channel rank order (already desc)
    np.testing.assert_allclose(np.array(out[1]), np.array([1.0, 0.5, 0.0]))
    np.testing.assert_allclose(np.array(out[0]), np.array([0.2, 0.0, 0.0]))


def test_weighted_mask_sum_equals_cell_size_expectation():
    ds = DimSpace(32, embed_ratio_grid(32))
    key = jax.random.PRNGKey(0)
    alpha = jax.random.uniform(key, (ds.num_cells,))
    switch = jnp.ones((ds.num_cells,), bool)
    wm = G.weighted_mask_1d(alpha, switch, jnp.asarray(ds.mask_bank))
    p = G.masked_softmax(alpha, switch)
    np.testing.assert_allclose(float(wm.sum()),
                               float(p @ jnp.asarray(ds.cell_sizes)),
                               rtol=1e-5)


def test_masked_layer_norm_matches_plain_when_full_mask():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 5, 16))
    scale = jnp.ones(16) * 1.3
    bias = jnp.zeros(16) + 0.2
    full = G.masked_layer_norm(x, jnp.ones(16), scale, bias)
    plain = G.layer_norm(x, scale, bias)
    np.testing.assert_allclose(np.array(full), np.array(plain), atol=1e-5)


def test_masked_layer_norm_subset_matches_torch_semantics():
    """Normalizing the masked-in subset must equal LayerNorm computed on the
    gathered subset (the reference's x_reserved path, layers.py:192-195)."""
    import torch
    rng = np.random.RandomState(0)
    x = rng.randn(3, 4, 10).astype(np.float32)
    mask = np.array([1, 1, 0, 1, 0, 1, 1, 0, 1, 1], np.float32)
    scale = rng.rand(10).astype(np.float32)
    bias = rng.rand(10).astype(np.float32)
    out = G.masked_layer_norm(jnp.asarray(x), jnp.asarray(mask),
                              jnp.asarray(scale), jnp.asarray(bias),
                              eps=1e-6, passthrough="zero")
    idx = np.where(mask > 0)[0]
    t = torch.nn.functional.layer_norm(
        torch.tensor(x[..., idx]), (len(idx),),
        torch.tensor(scale[idx]), torch.tensor(bias[idx]), eps=1e-6)
    np.testing.assert_allclose(np.array(out)[..., idx], t.numpy(), atol=1e-4)
    assert np.abs(np.array(out)[..., mask == 0]).max() == 0.0


def test_arch_state_creation_and_flags():
    space = SearchSpace.build(32, 2, 2, 64, 4)
    st = ArchState.create(space)
    assert not st.all_finished
    assert st.embed.switch.shape == (space.embed.num_cells,)
    assert st.blocks[0].attn.hard_mask.shape == (2, 16)
    # non-searchable dims are born finished
    space2 = SearchSpace.build(32, 1, 2, 64, 4, attn_search=False,
                               mlp_search=False, embed_search=False,
                               patch_search=False)
    st2 = ArchState.create(space2)
    assert st2.all_finished


def test_annealing_schedules():
    assert float(G.annealed_w_p(jnp.asarray(0.0), 20.0)) == pytest.approx(0.99)
    assert float(G.annealed_w_p(jnp.asarray(20.0), 20.0)) == pytest.approx(0.1)
    assert float(G.annealed_w_p(jnp.asarray(40.0), 20.0)) == pytest.approx(0.1)
    assert float(G.annealed_mask_keep_ratio(jnp.asarray(0.0), 20.0)) == \
        pytest.approx(0.95)
    assert float(G.annealed_mask_keep_ratio(jnp.asarray(30.0), 20.0)) == \
        pytest.approx(0.75)
