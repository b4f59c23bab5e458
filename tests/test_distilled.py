"""Distilled-model path: MIM supernet with dist token through search
forward, losses (reference losses.py:81-86), convergence and export."""

import numpy as np
import jax
import jax.numpy as jnp

from ofb_tpu.core.compress import compress
from ofb_tpu.core.export import export_subnet
from ofb_tpu.core.losses import distilled_pair_loss
from ofb_tpu.models.mim_vit import fuse_params, init_alphas, \
    init_mim_params, mim_forward
from ofb_tpu.models.search_space import ArchState, SearchSpace
from ofb_tpu.models.vit import ModelCfg, vit_forward

CFG = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
               depth=1, num_heads=2, mlp_ratio=2.0, distilled=True)


def setup():
    space = SearchSpace.build(CFG.embed_dim, CFG.depth, CFG.num_heads,
                              CFG.hidden, CFG.num_patches, patch_search=True)
    params = init_mim_params(jax.random.PRNGKey(0), CFG, space)
    alphas = init_alphas(jax.random.PRNGKey(1), space)
    return space, params, alphas, ArchState.create(space)


def test_distilled_forward_train_and_eval():
    space, params, alphas, arch = setup()
    assert "dist_token" in params and "head_dist" in params
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    out = mim_forward(params, alphas, arch, x, CFG, space, train=True,
                      use_mim=True, keep_ratio=jnp.asarray(0.8),
                      rng=jax.random.PRNGKey(3), compute_dtype=jnp.float32)
    assert out.logits_dist is not None
    loss = distilled_pair_loss(out.logits, out.logits_dist,
                               jnp.asarray([1, 2]), soft_labels=False,
                               smoothing=0.1)
    assert np.isfinite(float(loss))
    # eval: averaged heads, no dist output
    ev = mim_forward(params, alphas, arch, x, CFG, space, train=False,
                     use_mim=False, compute_dtype=jnp.float32)
    assert ev.logits_dist is None


def test_distilled_converge_and_export():
    space, params, alphas, arch = setup()

    def onehot(shape, idx):
        a = np.full(shape, -8.0, np.float32)
        a[idx] = 8.0
        return jnp.asarray(a)

    alphas["embed"] = onehot(np.asarray(alphas["embed"]).shape, 8)
    alphas["patch"] = onehot(np.asarray(alphas["patch"]).shape, 1)
    for b in alphas["blocks"]:
        b["attn"] = onehot(np.asarray(b["attn"]).shape, (0, 2))
        b["mlp"] = onehot(np.asarray(b["mlp"]).shape, 2)
    params, alphas, arch, _, rep = compress(params, alphas, arch, None,
                                            space, thresh=0.2)
    assert rep.finish_search

    fp, fa = fuse_params(params, arch, space, CFG)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 3))
    sup = mim_forward(fp, alphas, fa, x, CFG, space, train=False,
                      use_mim=False, fused=True, compute_dtype=jnp.float32)
    dense, dcfg, _ = export_subnet(fp, fa, space, CFG, fuse=False)
    assert "dist_token" in dense and "head_dist" in dense
    ref = vit_forward(dense, x, dcfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(sup.logits), np.asarray(ref),
                               atol=3e-4, rtol=1e-3)


def test_teacher_from_native_checkpoint_dir(tmp_path):
    """build_teacher accepts an ofb checkpoint DIRECTORY as teacher_path:
    the synthetic-trained-teacher path (e.g. distilling a search from a
    dense comparator finetuned on this machine's data)."""
    import dataclasses

    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.models.teacher import build_teacher
    from ofb_tpu.models.vit import init_vit_params
    from ofb_tpu.parallel.mesh import make_mesh

    tcfg = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                    depth=1, num_heads=2, mlp_ratio=2.0)
    tparams = init_vit_params(jax.random.PRNGKey(11), tcfg)
    d = str(tmp_path / "teacher_ckpt")
    ckpt.save_checkpoint(
        d, params=tparams,
        meta={"exported": True, "family": "vit",
              "model_cfg": dataclasses.asdict(tcfg)})

    mesh = make_mesh()
    apply = build_teacher("ignored_name", teacher_path=d, num_classes=10,
                          mesh=mesh, compute_dtype=jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(12), (2, 32, 32, 3))
    got = apply(x)
    want = vit_forward(tparams, x, tcfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
