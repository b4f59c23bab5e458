"""Export equivalence: the physically-sliced subnet must match the gated
supernet's eval forward exactly (the central claim of the static-gate
design, SURVEY §7.1). Also covers compress semantics on crafted alphas."""

import numpy as np
import jax
import jax.numpy as jnp

from ofb_tpu.core.compress import compress
from ofb_tpu.core.export import export_subnet
from ofb_tpu.models.mim_vit import fuse_params, init_alphas, init_mim_params, \
    mim_forward
from ofb_tpu.models.search_space import ArchState, SearchSpace
from ofb_tpu.models.vit import ModelCfg, vit_forward

CFG = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
               depth=2, num_heads=2, mlp_ratio=2.0, drop_path_rate=0.0)


def converged_state(key, patch_search=True):
    """Build a supernet and force every dimension to converge via compress."""
    space = SearchSpace.build(CFG.embed_dim, CFG.depth, CFG.num_heads,
                              CFG.hidden, CFG.num_patches,
                              patch_search=patch_search)
    params = init_mim_params(key, CFG, space)
    alphas = init_alphas(key, space)
    arch = ArchState.create(space)

    def onehot(shape, idx):
        a = np.full(shape, -8.0, np.float32)
        a[idx] = 8.0
        return jnp.asarray(a)

    alphas["embed"] = onehot(alphas["embed"].shape, 5)       # keep cell 5
    alphas["patch"] = onehot(alphas["patch"].shape, 2)
    for b in alphas["blocks"]:
        b["attn"] = onehot(b["attn"].shape, (0, 3))
        b["mlp"] = onehot(b["mlp"].shape, 4)

    params, alphas, arch, _, report = compress(params, alphas, arch, None,
                                               space, thresh=0.2)
    assert report.execute_prune
    assert report.finish_search, [str(e) for e in report.events]
    return space, params, alphas, arch


def test_compress_convergence_shapes():
    space, params, alphas, arch = converged_state(jax.random.PRNGKey(0))
    # embed cell 5 of grid range(16,33,1): 21 channels
    assert int(np.asarray(arch.embed.hard_mask).sum()) == 21
    for i in range(CFG.depth):
        ba = arch.blocks[i]
        hard = np.asarray(ba.attn.hard_mask)
        # attn cell (0,3): head_list[0]=2 heads, chan grid idx 3 of
        # range(4,17,2) -> 10 channels
        assert int((hard.sum(axis=1) > 0).sum()) == 2
        assert int(hard.sum()) == 2 * 10
        assert abs(float(ba.attn.scale) - 10 ** -0.5) < 1e-6
        # mlp cell 4 of range(16,65,8): 48 units
        assert int(np.asarray(ba.mlp.hard_mask).sum()) == 48


def test_export_matches_gated_supernet():
    key = jax.random.PRNGKey(1)
    space, params, alphas, arch = converged_state(key)

    fused_params, fused_arch = fuse_params(params, arch, space, CFG)
    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 32, 32, 3))

    sup = mim_forward(fused_params, alphas, fused_arch, x, CFG, space,
                      train=False, use_mim=False, fused=True,
                      compute_dtype=jnp.float32)

    dense_params, dense_cfg, meta = export_subnet(fused_params, fused_arch,
                                                  space, CFG, fuse=False)
    assert dense_cfg.embed_dim == 21
    assert dense_cfg.block_overrides == ((2, 10, 48), (2, 10, 48))
    dense = vit_forward(dense_params, x, dense_cfg,
                        compute_dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(sup.logits), np.asarray(dense),
                               atol=2e-4, rtol=1e-4)


def test_export_auto_fuses():
    key = jax.random.PRNGKey(3)
    space, params, alphas, arch = converged_state(key)
    dense_params, dense_cfg, _ = export_subnet(params, arch, space, CFG,
                                               fuse=True)
    # same as manual fuse-then-export
    fp, fa = fuse_params(params, arch, space, CFG)
    dp2, _, _ = export_subnet(fp, fa, space, CFG, fuse=False)
    for a, b in zip(jax.tree_util.tree_leaves(dense_params),
                    jax.tree_util.tree_leaves(dp2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_exported_param_count_shrinks():
    from ofb_tpu.core.export import exported_param_count
    key = jax.random.PRNGKey(4)
    space, params, alphas, arch = converged_state(key)
    dense_params, _, _ = export_subnet(params, arch, space, CFG)
    full = exported_param_count({k: v for k, v in params.items()
                                 if k not in ("decoder", "mask_token")})
    small = exported_param_count(dense_params)
    assert small < full
