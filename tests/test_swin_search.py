"""Searchable Swin: gated forward, alpha gradients, compress reuse,
FLOPs model, export (MLP slicing + fused attention gates)."""

import numpy as np
import jax
import jax.numpy as jnp

from ofb_tpu.core.compress import compress
from ofb_tpu.models.swin import SwinCfg, swin_forward
from ofb_tpu.models.swin_search import (build_swin_space,
                                        export_swin_subnet,
                                        init_swin_search,
                                        swin_model_flops,
                                        swin_search_forward)

CFG = SwinCfg(img_size=32, patch_size=2, num_classes=10, embed_dim=24,
              depths=(1, 1), num_heads=(2, 4), window=4, mlp_ratio=2.0,
              drop_path_rate=0.0)


def setup():
    space = build_swin_space(CFG)
    params, alphas, arch = init_swin_search(jax.random.PRNGKey(0), CFG,
                                            space)
    return space, params, alphas, arch


def test_space_layout():
    space, params, alphas, arch = setup()
    assert len(space.blocks) == sum(CFG.depths)
    assert space.blocks[0].attn.num_heads == 2
    assert space.blocks[1].attn.num_heads == 4
    assert space.blocks[1].mlp.dim == int(CFG.stage_dim(1) * CFG.mlp_ratio)
    assert bool(arch.embed.finished) and bool(arch.patch.finished)


def test_gated_forward_and_alpha_grads():
    space, params, alphas, arch = setup()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    logits = swin_search_forward(params, alphas, arch, x, CFG, space,
                                 compute_dtype=jnp.float32)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()

    def loss(alphas):
        out = swin_search_forward(params, alphas, arch, x, CFG, space,
                                  compute_dtype=jnp.float32)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(alphas)
    assert np.abs(np.asarray(g["blocks"][0]["attn"])).sum() > 0
    assert np.abs(np.asarray(g["blocks"][0]["mlp"])).sum() > 0


def test_flops_model_moves_with_alpha():
    space, params, alphas, arch = setup()
    total, searched = swin_model_flops(alphas, arch, space, CFG)
    assert float(searched) < float(total)
    # concentrate on the smallest cells -> searched shrinks
    small = []
    for b in alphas["blocks"]:
        a = np.full(np.asarray(b["attn"]).shape, -8.0, np.float32)
        a.reshape(-1)[0] = 8.0
        m = np.full(np.asarray(b["mlp"]).shape, -8.0, np.float32)
        m[0] = 8.0
        small.append({"attn": jnp.asarray(a), "mlp": jnp.asarray(m)})
    alphas_small = dict(alphas, blocks=small)
    _, s2 = swin_model_flops(alphas_small, arch, space, CFG)
    assert float(s2) < float(searched)


def test_flops_searched_equals_total_at_full_cell():
    """With every alpha fully on the LARGEST cell, the searched FLOPs must
    equal the dense total (catches per-term accounting drift, e.g. the
    round-1 proj term that dropped a factor of dim)."""
    space, params, alphas, arch = setup()
    full = []
    for i, bs in enumerate(space.blocks):
        a = np.full(np.asarray(alphas["blocks"][i]["attn"]).shape, -12.0,
                    np.float32)
        a.reshape(-1)[-1] = 12.0
        m = np.full((bs.mlp.num_cells,), -12.0, np.float32)
        m[-1] = 12.0
        full.append({"attn": jnp.asarray(a), "mlp": jnp.asarray(m)})
    total, searched = swin_model_flops(dict(alphas, blocks=full), arch,
                                       space, CFG)
    np.testing.assert_allclose(float(searched), float(total), rtol=1e-5)


def test_compress_and_export_equivalence():
    space, params, alphas, arch = setup()
    # realistic weight magnitudes: tiny trunc-normal init makes q.k ~ 0 and
    # would hide a wrong softmax scale in the exported model
    params = jax.tree_util.tree_map(
        lambda x: x * 3.0 if x.ndim >= 2 else x, params)

    def onehot(shape, idx):
        a = np.full(shape, -8.0, np.float32)
        a.reshape(-1)[idx] = 8.0
        return jnp.asarray(a)

    for b in alphas["blocks"]:
        b["attn"] = onehot(np.asarray(b["attn"]).shape, 2)
        b["mlp"] = onehot(np.asarray(b["mlp"]).shape, 3)
    params, alphas, arch, _, rep = compress(params, alphas, arch, None,
                                            space, thresh=0.2)
    assert rep.finish_search, rep.events
    for i, bs in enumerate(space.blocks):
        ba = arch.blocks[i]
        assert bool(ba.attn.finished) and bool(ba.mlp.finished)
        assert int(np.asarray(ba.mlp.hard_mask).sum()) == \
            int(bs.mlp.cell_sizes[3])

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    gated = swin_search_forward(params, alphas, arch, x, CFG, space,
                                compute_dtype=jnp.float32)
    dense, dcfg, meta = export_swin_subnet(params, arch, space, CFG)
    # exported blocks have sliced MLPs
    hid0 = dense["stages"][0]["blocks"][0]["mlp"]["fc1"]["kernel"].shape[1]
    assert hid0 == int(space.blocks[0].mlp.cell_sizes[3])
    ref = swin_forward(dense, x, dcfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(gated), np.asarray(ref),
                               atol=3e-4, rtol=1e-3)


def test_sparsity_losses_work_on_swin_layout():
    from ofb_tpu.core.losses import sparsity_losses
    space, params, alphas, arch = setup()
    sp = sparsity_losses(params, alphas, arch, space)
    assert float(sp["attn"]) > 0 and float(sp["mlp"]) > 0
    assert float(sp["embed"]) == 0.0     # embed not searchable in Swin
    # the score-norm term reads scores through the stage layout
    sp2 = sparsity_losses(params, alphas, arch, space, norm=False)
    assert float(sp["attn"]) > float(sp2["attn"])


# ---------------------------------------------------------------------------
# Per-stage embed-dim search across patch merging (round-2: the OFB-Swin
# extension — reference README.md:27-31)
# ---------------------------------------------------------------------------

def setup_embed():
    space = build_swin_space(CFG, embed_search=True)
    params, alphas, arch = init_swin_search(jax.random.PRNGKey(0), CFG,
                                            space)
    return space, params, alphas, arch


def test_embed_search_space_and_grads():
    space, params, alphas, arch = setup_embed()
    assert len(space.stage_embeds) == CFG.num_stages
    assert space.stage_embeds[0].dim == 24
    assert not arch.all_finished
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss(alphas):
        out = swin_search_forward(params, alphas, arch, x, CFG, space,
                                  compute_dtype=jnp.float32)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(alphas)
    for s in range(CFG.num_stages):
        assert np.abs(np.asarray(g["stage_embeds"][s])).sum() > 0


def test_embed_flops_full_cell_parity_and_motion():
    space, params, alphas, arch = setup_embed()

    def onehot(n, idx):
        a = np.full((n,), -12.0, np.float32)
        a[idx] = 12.0
        return jnp.asarray(a)

    full = dict(alphas)
    full["blocks"] = [{"attn": onehot(np.asarray(b["attn"]).size,
                                      np.asarray(b["attn"]).size - 1
                                      ).reshape(np.asarray(b["attn"]).shape),
                       "mlp": onehot(np.asarray(b["mlp"]).size,
                                     np.asarray(b["mlp"]).size - 1)}
                      for b in alphas["blocks"]]
    full["stage_embeds"] = [onehot(ds.num_cells, ds.num_cells - 1)
                            for ds in space.stage_embeds]
    total, searched = swin_model_flops(full, arch, space, CFG)
    np.testing.assert_allclose(float(searched), float(total), rtol=1e-5)

    small = dict(full)
    small["stage_embeds"] = [onehot(ds.num_cells, 0)
                             for ds in space.stage_embeds]
    _, s2 = swin_model_flops(small, arch, space, CFG)
    assert float(s2) < float(searched)


def test_embed_search_converge_and_export_equivalence():
    """Converge every dimension incl. per-stage embeds, export, and assert
    gated supernet == sliced model with realistic weight magnitudes."""
    space, params, alphas, arch = setup_embed()
    params = jax.tree_util.tree_map(
        lambda x: x * 3.0 if x.ndim >= 2 else x, params)

    def onehot(shape, idx):
        a = np.full(shape, -8.0, np.float32)
        a.reshape(-1)[idx] = 8.0
        return jnp.asarray(a)

    for b in alphas["blocks"]:
        b["attn"] = onehot(np.asarray(b["attn"]).shape, 2)
        b["mlp"] = onehot(np.asarray(b["mlp"]).shape, 3)
    alphas["stage_embeds"] = [
        onehot((ds.num_cells,), ds.num_cells // 2)
        for ds in space.stage_embeds]
    params, alphas, arch, _, rep = compress(params, alphas, arch, None,
                                            space, thresh=0.2)
    assert rep.finish_search, rep.events
    for s, ds in enumerate(space.stage_embeds):
        ea = arch.stage_embeds[s]
        assert bool(ea.finished)
        want = int(ds.cell_sizes[ds.num_cells // 2])
        assert int(np.asarray(ea.hard_mask).sum()) == want

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    gated = swin_search_forward(params, alphas, arch, x, CFG, space,
                                compute_dtype=jnp.float32)
    dense, dcfg, meta = export_swin_subnet(params, arch, space, CFG)
    # residual widths really shrank, through the patch-merging concat
    assert meta["stage_dims"] == [
        int(ds.cell_sizes[ds.num_cells // 2]) for ds in space.stage_embeds]
    red = dense["stages"][0]["downsample"]["reduction"]["kernel"]
    assert red.shape == (4 * meta["stage_dims"][0], meta["stage_dims"][1])
    ref = swin_forward(dense, x, dcfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(gated), np.asarray(ref),
                               atol=3e-4, rtol=1e-3)


def test_swin_search_train_step_and_freeze():
    """Full Swin search training step (CE + sparsity + FLOPs targeting,
    three-family AdamW): losses finite, alphas move; after convergence the
    module's alpha is frozen (update suppressed)."""
    from ofb_tpu.config import SearchConfig
    from ofb_tpu.core.optim import build_search_optimizer
    from ofb_tpu.core.steps import TrainState
    from ofb_tpu.core.swin_steps import (make_swin_eval_step,
                                         make_swin_search_step)

    space = build_swin_space(CFG, embed_search=True)
    params, alphas, arch = init_swin_search(jax.random.PRNGKey(0), CFG,
                                            space)
    scfg = SearchConfig(accum_iter=2, target_flops=0.0002).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=100, steps_per_epoch=10)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))
    step = make_swin_search_step(space, CFG, scfg, tx,
                                 compute_dtype=jnp.float32, donate=False)

    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 32, 32, 3))
    lbls = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 0, 10)
    a0 = np.asarray(state.alphas["blocks"][0]["mlp"])
    e0 = np.asarray(state.alphas["stage_embeds"][0])
    for i in range(2):
        state, m = step(state, imgs, lbls, jax.random.PRNGKey(3 + i))
    assert np.isfinite(float(m["loss_total"]))
    assert float(m["searched_gflops"]) > 0
    assert np.abs(np.asarray(state.alphas["blocks"][0]["mlp"]) - a0).max() > 0
    assert np.abs(np.asarray(state.alphas["stage_embeds"][0]) - e0).max() > 0

    # force convergence of stage-0 embed, then its alpha must stop moving
    al = jax.device_get(state.alphas)
    a = np.full_like(np.asarray(al["stage_embeds"][0]), -8.0)
    a[len(a) // 2] = 8.0
    al["stage_embeds"][0] = jnp.asarray(a)
    p2, al2, arch2, opt2, rep = compress(
        jax.device_get(state.params), al,
        jax.tree_util.tree_map(jax.device_get, state.arch),
        jax.device_get(state.opt_state), space, 0.2)
    assert bool(arch2.stage_embeds[0].finished)
    state = state.replace(params=p2, alphas=al2, arch=arch2, opt_state=opt2)
    frozen = np.asarray(state.alphas["stage_embeds"][0])
    state, m = step(state, imgs, lbls, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(
        np.asarray(state.alphas["stage_embeds"][0]), frozen)
    assert np.isfinite(float(m["loss_total"]))

    ev = make_swin_eval_step(space, CFG, compute_dtype=jnp.float32)
    em = ev(state.params, state.alphas, state.arch, imgs[0], lbls[0])
    assert np.isfinite(float(em["loss_sum"]))


def test_search_window_pack_equivalence():
    """OFB_SWIN_PACK must be numerically equivalent on the GATED search
    forward too (gate-fold + packed block-diagonal attention)."""
    import os
    from ofb_tpu.models.registry import create_model
    from ofb_tpu.models.swin_search import swin_search_forward
    cfg = SwinCfg(img_size=56, patch_size=4, num_classes=5, embed_dim=16,
                  depths=(2, 2), num_heads=(2, 4), window=7,
                  drop_path_rate=0.0)
    space = build_swin_space(cfg, embed_search=True)
    params, alphas, arch = init_swin_search(jax.random.PRNGKey(0), cfg,
                                            space)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 56, 56, 3))
    os.environ["OFB_SWIN_PACK"] = "1"
    try:
        base = np.asarray(swin_search_forward(params, alphas, arch, x, cfg,
                                              space, train=False,
                                              compute_dtype=jnp.float32))
    finally:
        os.environ.pop("OFB_SWIN_PACK", None)
    os.environ["OFB_SWIN_PACK"] = "2"
    try:
        packed = np.asarray(swin_search_forward(params, alphas, arch, x,
                                                cfg, space, train=False,
                                                compute_dtype=jnp.float32))
    finally:
        os.environ.pop("OFB_SWIN_PACK", None)
    np.testing.assert_allclose(packed, base, atol=2e-5, rtol=1e-5)
