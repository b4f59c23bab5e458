"""Head-only and channel-only attention search variants
(reference models/layers.py:424-448: --head_search / --channel_search),
through forward, compress convergence, and export."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofb_tpu.core.compress import compress
from ofb_tpu.core.export import export_subnet
from ofb_tpu.models.mim_vit import fuse_params, init_alphas, \
    init_mim_params, mim_forward
from ofb_tpu.models.search_space import ArchState, AttnSpace, SearchSpace
from ofb_tpu.models.vit import ModelCfg, vit_forward

CFG = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
               depth=2, num_heads=4, mlp_ratio=2.0)  # 4 heads, d=8


def build(head_search=False, channel_search=False):
    space = SearchSpace.build(CFG.embed_dim, CFG.depth, CFG.num_heads,
                              CFG.hidden, CFG.num_patches,
                              patch_search=True, head_search=head_search,
                              channel_search=channel_search)
    key = jax.random.PRNGKey(0)
    params = init_mim_params(key, CFG, space)
    alphas = init_alphas(key, space)
    return space, params, alphas, ArchState.create(space)


def test_head_search_grid_and_score_shape():
    space, params, alphas, arch = build(head_search=True)
    a = space.blocks[0].attn
    assert a.head_list == (2, 4)
    assert a.chan_ratios == (1.0,)
    assert params["blocks"][0]["attn"]["score"].shape == (4, 1)
    assert alphas["blocks"][0]["attn"].shape == (2, 1)


def test_channel_search_grid_and_score_shape():
    space, params, alphas, arch = build(channel_search=True)
    a = space.blocks[0].attn
    assert a.head_list == (4,)
    assert len(a.chan_ratios) > 1
    assert params["blocks"][0]["attn"]["score"].shape == (1, 8)
    assert alphas["blocks"][0]["attn"].shape == (1, len(a.chan_ratios))


@pytest.mark.parametrize("mode", ["head", "channel"])
def test_variant_forward_and_converge_and_export(mode):
    space, params, alphas, arch = build(head_search=(mode == "head"),
                                        channel_search=(mode == "channel"))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    out = mim_forward(params, alphas, arch, x, CFG, space, train=True,
                      use_mim=True, keep_ratio=jnp.asarray(0.8),
                      rng=jax.random.PRNGKey(2), compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out.logits)).all()

    # force convergence on cell 0 of every module
    def onehot(shape, idx):
        a = np.full(shape, -8.0, np.float32)
        a[idx] = 8.0
        return jnp.asarray(a)

    alphas["embed"] = onehot(np.asarray(alphas["embed"]).shape, 5)
    alphas["patch"] = onehot(np.asarray(alphas["patch"]).shape, 2)
    for b in alphas["blocks"]:
        b["attn"] = onehot(np.asarray(b["attn"]).shape,
                           (0, 0))
        b["mlp"] = onehot(np.asarray(b["mlp"]).shape, 3)
    params, alphas, arch, _, rep = compress(params, alphas, arch, None,
                                            space, thresh=0.2)
    assert rep.finish_search, rep.events

    ba = arch.blocks[0].attn
    hard = np.asarray(ba.attn if False else ba.hard_mask)
    if mode == "head":
        # cell (0, 0): 2 heads kept, full channels
        assert int((hard.sum(axis=1) > 0).sum()) == 2
        assert int(hard.sum()) == 2 * 8
    else:
        # cell (0, 0): all 4 heads, smallest channel count (d//4 = 2)
        assert int((hard.sum(axis=1) > 0).sum()) == 4
        assert int(hard.sum()) == 4 * space.blocks[0].attn.chan_counts[0]

    # export equivalence
    fp, fa = fuse_params(params, arch, space, CFG)
    sup = mim_forward(fp, alphas, fa, x, CFG, space, train=False,
                      use_mim=False, fused=True, compute_dtype=jnp.float32)
    dense, dcfg, _ = export_subnet(fp, fa, space, CFG, fuse=False)
    ref = vit_forward(dense, x, dcfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sup.logits), np.asarray(ref),
                               atol=3e-4, rtol=1e-3)
