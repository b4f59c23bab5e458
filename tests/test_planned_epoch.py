"""Planned-epoch step/loop: one-dispatch-per-iteration cache-feed path.

The planned step (steps.make_planned_search_step) moves the per-iteration
host work of the classic loop — w_p anneal (reference engine.py:110-117),
PMIM keep-ratio anneal (engine.py:102-109), rng split, cache gather,
label upload, metric unpacking — inside the jitted program. These tests
prove it computes EXACTLY what the classic step computes when driven with
the same schedule values and keys, and that the epoch loop around it
keeps the ArchState.w_p invariant (host state == last in-jit value).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ofb_tpu.config import OptimFamilyConfig, ScheduleConfig, SearchConfig
from ofb_tpu.core.compress import sync_w_p
from ofb_tpu.core.engine import search_one_epoch_planned
from ofb_tpu.core.optim import build_search_optimizer
from ofb_tpu.core.steps import (TrainState, keep_ratio_schedule,
                                make_planned_search_step,
                                make_planned_train_step, make_search_step,
                                make_train_step, w_p_schedule)
from ofb_tpu.data.samplers import epoch_batches
from ofb_tpu.models.registry import ModelBundle
from ofb_tpu.models.search_space import SearchSpace
from ofb_tpu.models.vit import ModelCfg

CFG = ModelCfg(img_size=16, patch_size=4, num_classes=4, embed_dim=32,
               depth=1, num_heads=2, mlp_ratio=2.0)
STAGING = 20          # cache staging resolution > out_size
N, BS, STEPS = 32, 8, 4


def _setup(warmup_epochs=2):
    space = SearchSpace.build(CFG.embed_dim, CFG.depth, CFG.num_heads,
                              CFG.hidden, CFG.num_patches, patch_search=True)
    bundle = ModelBundle(name="t", cfg=CFG, kind="mim", space=space)
    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    scfg = SearchConfig(
        accum_iter=1, target_flops=0.0002,
        schedule=ScheduleConfig(warmup_epochs=warmup_epochs),
        optim_param=OptimFamilyConfig(lr=1e-3),
        optim_decoder=OptimFamilyConfig(lr=1e-3),
        optim_arch=OptimFamilyConfig(lr=1e-3, betas=(0.5, 0.999)),
    ).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=1000, steps_per_epoch=STEPS)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))
    rng = np.random.default_rng(3)
    cache = jnp.asarray(
        rng.integers(0, 256, (N, STAGING, STAGING, 3)).astype(np.uint8))
    labels = rng.integers(0, CFG.num_classes, (N,)).astype(np.int32)
    batches = epoch_batches(np.arange(N), BS, drop_last=True)[:STEPS]
    return space, scfg, tx, state, cache, labels, batches


AUG = dict(use_randaug=False, re_prob=0.0, hflip=True)


def test_planned_step_matches_manual_composition():
    """planned step == sync_w_p + keep schedule + host gather + classic
    fused-augment step, driven with identical fold_in keys."""
    space, scfg, tx, state, cache, labels, batches = _setup()

    pstep, keys = make_planned_search_step(
        space, CFG, scfg, tx, phase="search", steps_per_epoch=STEPS,
        compute_dtype=jnp.float32, donate=False, **AUG)
    cstep = make_search_step(space, CFG, scfg, tx, phase="search",
                             compute_dtype=jnp.float32, donate=False,
                             fused_augment=True, **AUG)

    idx_plan = jnp.asarray(np.stack(batches).astype(np.int32))
    labels_plan = jnp.asarray(labels[np.stack(batches)].astype(np.int32))
    key = jax.random.PRNGKey(11)
    base = state.step
    epoch_dev = jnp.asarray(0, jnp.int32)

    p_state = state
    packed_hist = []
    for _ in range(STEPS):
        p_state, packed = pstep(p_state, cache, idx_plan, labels_plan, key,
                                base, epoch_dev)
        packed_hist.append(packed)

    m_state = state
    warm = scfg.schedule.warmup_epochs
    host_cache = np.asarray(cache)
    for it in range(STEPS):
        frac = it / STEPS
        arch = sync_w_p(m_state.arch, frac, warm)
        keep = keep_ratio_schedule(frac, scfg, arch, space)
        b = batches[it]
        imgs = jnp.asarray(host_cache[b][None])          # (A=1, mb, S, S, 3)
        lbls = jnp.asarray(labels[b][None].astype(np.int32))
        sub = jax.random.fold_in(key, it)
        m_state, metrics = cstep(m_state.replace(arch=arch), imgs, lbls,
                                 sub, jnp.asarray(keep))
        packed = packed_hist[it]
        for j, k in enumerate(keys):
            np.testing.assert_allclose(float(packed[j]), float(metrics[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    for pa, ma in zip(jax.tree_util.tree_leaves(p_state.params),
                      jax.tree_util.tree_leaves(m_state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(ma),
                                   rtol=1e-5, atol=1e-6)
    for pa, ma in zip(jax.tree_util.tree_leaves(p_state.alphas),
                      jax.tree_util.tree_leaves(m_state.alphas)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(ma),
                                   rtol=1e-5, atol=1e-6)


def test_planned_epoch_loop_runs_and_syncs_w_p():
    """search_one_epoch_planned: finite stats, compress cadence fires, and
    the epoch-final host ArchState.w_p equals the schedule value the next
    in-jit step would use."""
    space, scfg, tx, state, cache, labels, batches = _setup(warmup_epochs=2)
    pstep, keys = make_planned_search_step(
        space, CFG, scfg, tx, phase="search", steps_per_epoch=STEPS,
        compute_dtype=jnp.float32, donate=False, **AUG)

    state, stats, finish, pruned = search_one_epoch_planned(
        state, pstep, keys, cache, labels, batches, epoch=0, scfg=scfg,
        space=space, rng=jax.random.PRNGKey(5), finish_search=False,
        log_every=2, print_fn=lambda *a, **k: None)

    assert np.isfinite(stats["loss_total"])
    assert stats["img_s"] > 0
    want = float(w_p_schedule(1.0, scfg.schedule.warmup_epochs))
    got = float(jax.device_get(state.arch.embed.w_p))
    assert abs(got - want) < 1e-6
    # counter advanced one epoch of micro-iterations
    assert int(jax.device_get(state.step)) == STEPS * scfg.accum_iter


def test_planned_loop_nan_halts():
    """The planned loop's packed-metric NaN guard must abort like the
    classic loop (reference engine.py:148-150). uint8 cache inputs cannot
    carry a NaN, so poison a weight instead."""
    import pytest
    space, scfg, tx, state, cache, labels, batches = _setup()
    pstep, keys = make_planned_search_step(
        space, CFG, scfg, tx, phase="search", steps_per_epoch=STEPS,
        compute_dtype=jnp.float32, donate=False, **AUG)
    poisoned = jax.tree_util.tree_map(lambda x: x, state.params)
    poisoned["cls_token"] = state.params["cls_token"] * jnp.nan
    state = state.replace(params=poisoned)
    with pytest.raises(SystemExit) as ei:
        search_one_epoch_planned(
            state, pstep, keys, cache, labels, batches, epoch=0, scfg=scfg,
            space=space, rng=jax.random.PRNGKey(5), finish_search=True,
            log_every=2, print_fn=lambda *a, **k: None)
    assert ei.value.code == 1


def test_planned_swin_step_matches_manual():
    """planned Swin search step == sync_w_p + host gather + classic
    fused-augment Swin step with identical fold_in keys (driven through
    the shared search_one_epoch_planned loop contract)."""
    from ofb_tpu.core.swin_steps import (make_planned_swin_search_step,
                                         make_swin_search_step)
    from ofb_tpu.models.swin import SwinCfg
    from ofb_tpu.models.swin_search import build_swin_space, init_swin_search

    cfg = SwinCfg(img_size=32, patch_size=2, num_classes=10, embed_dim=24,
                  depths=(1, 1), num_heads=(2, 4), window=4, mlp_ratio=2.0,
                  drop_path_rate=0.0)
    space = build_swin_space(cfg)
    params, alphas, arch = init_swin_search(jax.random.PRNGKey(0), cfg,
                                            space)
    scfg = SearchConfig(
        accum_iter=1, target_flops=0.001,
        schedule=ScheduleConfig(warmup_epochs=2),
        optim_param=OptimFamilyConfig(lr=1e-3),
        optim_decoder=OptimFamilyConfig(lr=1e-3),
        optim_arch=OptimFamilyConfig(lr=1e-3, betas=(0.5, 0.999)),
    ).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=1000, steps_per_epoch=STEPS)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))
    rng = np.random.default_rng(5)
    cache = jnp.asarray(
        rng.integers(0, 256, (N, 36, 36, 3)).astype(np.uint8))
    labels = rng.integers(0, cfg.num_classes, (N,)).astype(np.int32)
    batches = epoch_batches(np.arange(N), BS, drop_last=True)[:STEPS]

    pstep, keys = make_planned_swin_search_step(
        space, cfg, scfg, tx, phase="search", steps_per_epoch=STEPS,
        compute_dtype=jnp.float32, donate=False, **AUG)
    cstep = make_swin_search_step(space, cfg, scfg, tx, phase="search",
                                  compute_dtype=jnp.float32, donate=False,
                                  fused_augment=True,
                                  aug_use_randaug=False, aug_re_prob=0.0,
                                  aug_hflip=True)

    idx_plan = jnp.asarray(np.stack(batches).astype(np.int32))
    labels_plan = jnp.asarray(labels[np.stack(batches)].astype(np.int32))
    key = jax.random.PRNGKey(13)
    p_state = state
    for _ in range(STEPS):
        p_state, _ = pstep(p_state, cache, idx_plan, labels_plan, key,
                           state.step, jnp.asarray(0, jnp.int32))

    m_state = state
    host_cache = np.asarray(cache)
    for it in range(STEPS):
        arch_s = sync_w_p(m_state.arch, it / STEPS,
                          scfg.schedule.warmup_epochs)
        b = batches[it]
        imgs = jnp.asarray(host_cache[b][None])
        lbls = jnp.asarray(labels[b][None].astype(np.int32))
        m_state, _ = cstep(m_state.replace(arch=arch_s), imgs, lbls,
                           jax.random.fold_in(key, it))

    for pa, ma in zip(jax.tree_util.tree_leaves(p_state.params),
                      jax.tree_util.tree_leaves(m_state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(ma),
                                   rtol=1e-5, atol=1e-6)


def test_planned_train_step_matches_manual():
    """planned finetune step == host gather + classic fused-augment train
    step with identical fold_in keys (the finetune-CLI analog)."""
    import optax
    from ofb_tpu.core.engine import train_one_epoch_planned
    from ofb_tpu.models.vit import init_vit_params

    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    tx = optax.adamw(1e-3)
    state0 = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                        alphas=None, arch=None, opt_state=tx.init(params))
    rng = np.random.default_rng(9)
    cache = jnp.asarray(
        rng.integers(0, 256, (N, STAGING, STAGING, 3)).astype(np.uint8))
    labels = rng.integers(0, CFG.num_classes, (N,)).astype(np.int32)
    batches = epoch_batches(np.arange(N), BS, drop_last=True)[:STEPS]

    common = dict(num_classes=CFG.num_classes, mixup_cfg=None,
                  smoothing=0.1, compute_dtype=jnp.float32, donate=False)
    pstep = make_planned_train_step(CFG, tx, accum_iter=1,
                                    use_randaug=False, re_prob=0.0,
                                    hflip=True, **common)
    cstep = make_train_step(CFG, tx, fused_augment=True,
                            aug_use_randaug=False, aug_re_prob=0.0,
                            aug_hflip=True, **common)

    key = jax.random.PRNGKey(21)
    idx_plan = jnp.asarray(np.stack(batches).astype(np.int32))
    labels_plan = jnp.asarray(labels[np.stack(batches)].astype(np.int32))
    p_state = state0
    for _ in range(STEPS):
        p_state, _loss = pstep(p_state, cache, idx_plan, labels_plan, key,
                               state0.step)

    m_state = state0
    host_cache = np.asarray(cache)
    for it in range(STEPS):
        b = batches[it]
        imgs = jnp.asarray(host_cache[b][None])
        lbls = jnp.asarray(labels[b][None].astype(np.int32))
        m_state, _ = cstep(m_state, imgs, lbls, jax.random.fold_in(key, it))

    for pa, ma in zip(jax.tree_util.tree_leaves(p_state.params),
                      jax.tree_util.tree_leaves(m_state.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(ma),
                                   rtol=1e-5, atol=1e-6)

    # and the epoch loop drives it end to end
    state, stats = train_one_epoch_planned(
        state0, pstep, cache, labels, batches, epoch=0,
        rng=jax.random.PRNGKey(2), log_every=2,
        print_fn=lambda *a, **k: None)
    assert np.isfinite(stats["loss"]) and stats["img_s"] > 0


def _manual_classic_epoch(m_state, epoch, key_e, cstep, cache_np, labels,
                          batches, scfg, space):
    """Reference composition of one planned epoch: host sync_w_p + keep
    schedule + host gather + classic fused-augment step, with the SAME
    compress cadence / boundary w_p syncs / epoch-end sync the planned
    loop performs (engine.search_one_epoch_planned)."""
    from ofb_tpu.core.compress import compress
    steps = len(batches)
    A = scfg.accum_iter
    micro = steps * A
    warm = scfg.schedule.warmup_epochs
    compress_every = max(steps // scfg.compress_per_epoch, 1)
    events = []
    for it in range(steps):
        frac = epoch + (it * A) / micro
        arch = sync_w_p(m_state.arch, frac, warm)
        keep = keep_ratio_schedule(frac, scfg, arch, space)
        b = batches[it]
        imgs = jnp.asarray(cache_np[b][None])
        lbls = jnp.asarray(labels[b][None].astype(np.int32))
        m_state, _ = cstep(m_state.replace(arch=arch), imgs, lbls,
                           jax.random.fold_in(key_e, it), jnp.asarray(keep))
        if (it + 1) % compress_every == 0:
            frac_b = epoch + ((it + 1) * A) / micro
            m_state = m_state.replace(
                arch=sync_w_p(m_state.arch, frac_b, warm))
            p, a, ar, o, rep = compress(
                m_state.params, m_state.alphas, m_state.arch,
                m_state.opt_state, space, scfg.compress_thresh)
            m_state = m_state.replace(params=p, alphas=a, arch=ar,
                                      opt_state=o)
            events.extend(rep.events)
    m_state = m_state.replace(arch=sync_w_p(m_state.arch, epoch + 1.0, warm))
    return m_state, events


def _arch_leaves(arch):
    return jax.tree_util.tree_leaves(arch)


def _kill_cell(state, module, cell):
    """Push one alpha cell far below the kill threshold (deterministic
    organic-style prune at the next compress boundary)."""
    if module == "mlp0":
        al = np.asarray(jax.device_get(state.alphas["blocks"][0]["mlp"]))
        al = al.copy(); al.reshape(-1)[cell] = -8.0
        blocks = list(state.alphas["blocks"])
        blocks[0] = dict(blocks[0], mlp=jnp.asarray(al))
        return state.replace(alphas=dict(state.alphas, blocks=blocks))
    al = np.asarray(jax.device_get(state.alphas["embed"])).copy()
    al.reshape(-1)[cell] = -8.0
    return state.replace(alphas=dict(state.alphas, embed=jnp.asarray(al)))


def test_planned_loop_equals_classic_composition_across_compress_and_resume(
        tmp_path):
    """Property (VERDICT r3 weak-5): over a MULTI-epoch run with compress
    events at two different epochs, an odd compress cadence
    (compress_every=1), and a checkpoint resume in the middle, the planned
    epoch loop's ArchState stays BIT-IDENTICAL to the classic composition
    and the params stay numerically equal. Catches silent w_p-mirror or
    cadence divergence between the in-jit anneal and the host sync."""
    from ofb_tpu.core import checkpoint as ckpt

    space, scfg, tx, state0, cache, labels, batches = _setup(warmup_epochs=2)
    # odd cadence: compress after EVERY step
    import dataclasses
    scfg = dataclasses.replace(scfg, compress_per_epoch=len(batches))

    pstep, keys = make_planned_search_step(
        space, CFG, scfg, tx, phase="search", steps_per_epoch=STEPS,
        compute_dtype=jnp.float32, donate=False, **AUG)
    cstep = make_search_step(space, CFG, scfg, tx, phase="search",
                             compute_dtype=jnp.float32, donate=False,
                             fused_augment=True, **AUG)

    # crafted kill #1 at init: fires at epoch 0's first compress boundary
    state0 = _kill_cell(state0, "mlp0", 0)
    p_state = state0
    m_state = state0
    cache_np = np.asarray(cache)
    events_p, events_m = [], []

    for epoch in range(3):
        key_e = jax.random.PRNGKey(100 + epoch)

        if epoch == 2:
            # resume-in-the-middle: round-trip the planned state through a
            # checkpoint (what scripts/search.py --resume does between
            # stages) and apply crafted kill #2 to both sides
            d = str(tmp_path / "ck")
            ckpt.save_checkpoint(d, params=p_state.params,
                                 alphas=p_state.alphas, arch=p_state.arch,
                                 opt_state=p_state.opt_state,
                                 meta={"epoch": epoch})
            restored = ckpt.load_checkpoint(
                d, params=p_state.params, alphas=p_state.alphas,
                arch=p_state.arch, opt_state=p_state.opt_state)
            p_state = p_state.replace(params=restored["params"],
                                      alphas=restored["alphas"],
                                      arch=restored["arch"],
                                      opt_state=restored["opt_state"])
            p_state = _kill_cell(p_state, "embed", 1)
            m_state = _kill_cell(m_state, "embed", 1)

        printed = []
        p_state, _stats, _fin, _pruned = search_one_epoch_planned(
            p_state, pstep, keys, cache, labels, batches, epoch=epoch,
            scfg=scfg, space=space, rng=key_e, finish_search=False,
            log_every=2, print_fn=lambda *a, **k: printed.append(a))
        events_p.extend(
            a[0].strip() for a in printed
            if a and isinstance(a[0], str) and "prune event" in a[0])

        m_state, ev = _manual_classic_epoch(
            m_state, epoch, key_e, cstep, cache_np, labels, batches, scfg,
            space)
        events_m.extend(e for e in ev if "prune event" in e)

        # ArchState: bit-identical at every epoch boundary
        for pl, ml in zip(_arch_leaves(p_state.arch),
                          _arch_leaves(m_state.arch)):
            np.testing.assert_array_equal(np.asarray(pl), np.asarray(ml))
        # params/alphas: numerically equal (two different XLA programs)
        for pa, ma in zip(jax.tree_util.tree_leaves(p_state.params),
                          jax.tree_util.tree_leaves(m_state.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(ma),
                                       rtol=5e-4, atol=1e-5)
        for pa, ma in zip(jax.tree_util.tree_leaves(p_state.alphas),
                          jax.tree_util.tree_leaves(m_state.alphas)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(ma),
                                       rtol=5e-4, atol=1e-5)

    # both crafted kills fired, identically, on both sides
    assert events_p == events_m
    assert any("mlp" in e for e in events_p)
    assert any("embed" in e for e in events_p)
    assert int(jax.device_get(p_state.step)) == 3 * STEPS * scfg.accum_iter
