"""Schedules (tanh/step/plateau), decompress, file-list data, checkpointing,
EMA semantics, moment surgery."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ofb_tpu.config import OptimFamilyConfig, ScheduleConfig
from ofb_tpu.core.compress import compress, decompress, update_w_p
from ofb_tpu.core.optim import (PlateauTracker, build_search_optimizer,
                                make_schedule, tanh_schedule,
                                zero_adam_moments)
from ofb_tpu.data.file_list import ForeverDataIterator, ImageList, \
    parse_image_list
from ofb_tpu.models.mim_vit import init_alphas, init_mim_params
from ofb_tpu.models.search_space import ArchState, SearchSpace
from ofb_tpu.models.vit import ModelCfg


CFG = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
               depth=1, num_heads=2, mlp_ratio=2.0)


def tiny():
    space = SearchSpace.build(32, 1, 2, CFG.hidden, CFG.num_patches,
                              patch_search=True)
    params = init_mim_params(jax.random.PRNGKey(0), CFG, space)
    alphas = init_alphas(jax.random.PRNGKey(1), space)
    return space, params, alphas, ArchState.create(space)


def test_tanh_schedule_shape():
    sched = ScheduleConfig(sched="tanh", warmup_lr=1e-6, min_lr=1e-5,
                           warmup_epochs=1)
    fn = make_schedule(1e-3, sched, total_steps=110, steps_per_epoch=10)
    assert float(fn(0)) == pytest.approx(1e-6)
    assert float(fn(10)) == pytest.approx(1e-3, rel=1e-3)
    # decays monotonically towards min_lr
    vals = [float(fn(t)) for t in range(10, 111, 20)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert vals[-1] < 2e-4


def test_plateau_tracker():
    pt = PlateauTracker(patience=2, decay_rate=0.5, mode="max")
    for acc in (10.0, 11.0, 11.0, 11.0):
        s = pt.update(acc)
    assert s == 1.0             # only 2 bad epochs so far (<= patience)
    s = pt.update(11.0)         # 3rd bad epoch > patience -> decay
    assert s == 0.5


def test_decompress_reopens_unconverged():
    space, params, alphas, arch = tiny()
    # converge embed
    a = np.full(np.asarray(alphas["embed"]).shape, -8.0, np.float32)
    a[4] = 8.0
    alphas["embed"] = jnp.asarray(a)
    p, al, ar, _, rep = compress(params, alphas, arch, None, space, 0.2)
    assert bool(ar.embed.finished)
    # single-cell module stays finished after decompress; the patch dim
    # (still multi-cell) reopens
    reopened = decompress(ar)
    assert bool(reopened.embed.finished)       # one active cell left
    assert not bool(reopened.patch.finished)


def test_update_w_p_freezes_finished():
    space, params, alphas, arch = tiny()
    a = np.full(np.asarray(alphas["embed"]).shape, -8.0, np.float32)
    a[4] = 8.0
    alphas["embed"] = jnp.asarray(a)
    _, _, ar, _, _ = compress(params, alphas, arch, None, space, 0.2)
    w_before = float(ar.embed.w_p)
    ar2 = update_w_p(ar, 10.0, 20.0)
    assert float(ar2.embed.w_p) == w_before           # finished: frozen
    assert float(ar2.blocks[0].mlp.w_p) != 0.99        # unfinished: annealed


def test_zero_adam_moments_paths():
    params = {"a": jnp.ones(3), "b": {"score": jnp.ones(2)}}
    tx = optax.adam(1e-3)
    st = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    _, st = tx.update(g, st, params)
    st2 = zero_adam_moments(st, lambda p: "score" in p)
    adam = [s for s in st2 if isinstance(s, optax.ScaleByAdamState)][0]
    assert float(jnp.abs(adam.mu["b"]["score"]).max()) == 0.0
    assert float(jnp.abs(adam.mu["a"]).max()) > 0.0


def test_parse_image_list_and_forever_iterator(tmp_path):
    f = tmp_path / "list.txt"
    f.write_text("a/img1.jpg 3\nb/img2.jpg 7\n")
    samples = parse_image_list(str(f), root="/data")
    assert samples == [("/data/a/img1.jpg", 3), ("/data/b/img2.jpg", 7)]

    batches = [[1, 2], [3, 4]]
    it = ForeverDataIterator(lambda epoch: iter(batches))
    got = [next(it) for _ in range(5)]
    assert got == [[1, 2], [3, 4], [1, 2], [3, 4], [1, 2]]
    assert it.epoch == 2


def test_checkpoint_roundtrip_with_arch(tmp_path):
    from ofb_tpu.core import checkpoint as ckpt
    space, params, alphas, arch = tiny()
    d = str(tmp_path / "c")
    ckpt.save_checkpoint(d, params=params, alphas=alphas, arch=arch,
                         meta={"epoch": 5})
    p2 = init_mim_params(jax.random.PRNGKey(42), CFG, space)
    a2 = init_alphas(jax.random.PRNGKey(43), space)
    r = ckpt.load_checkpoint(d, params=p2, alphas=a2,
                             arch=ArchState.create(space))
    assert r["meta"]["epoch"] == 5
    np.testing.assert_array_equal(np.asarray(r["alphas"]["embed"]),
                                  np.asarray(alphas["embed"]))
    np.testing.assert_array_equal(np.asarray(r["arch"].embed.hard_mask),
                                  np.asarray(arch.embed.hard_mask))


def test_schedule_accum_scaling():
    """With accum_iter > 1 the schedule must advance accum micro-steps per
    optimizer update (reference steps its per-iteration schedulers with
    micro counts, engine.py:178-184)."""
    fam = OptimFamilyConfig(lr=1e-3)
    sched = ScheduleConfig(warmup_lr=0.0, min_lr=0.0, warmup_epochs=1)
    _, s1 = build_search_optimizer(fam, fam, fam, sched, total_steps=100,
                                   steps_per_epoch=10, accum_iter=1)
    _, s2 = build_search_optimizer(fam, fam, fam, sched, total_steps=100,
                                   steps_per_epoch=10, accum_iter=4)
    # after 5 optimizer updates with accum 4, lr equals micro-step 20
    assert float(s2["param"](5)) == pytest.approx(float(s1["param"](20)),
                                                  rel=1e-6)


@pytest.mark.smoke
def test_arch_schedule_floor_override():
    """sched_arch overrides the ARCH family's schedule only: with a
    min_lr floor the arch LR must end at the floor while param/decoder
    still decay to the shared min_lr (the organic convergence-tail fix —
    scripts/alpha_tail.py, search.py --min-lr-arch)."""
    import dataclasses
    fam = OptimFamilyConfig(lr=2e-3)
    sched = ScheduleConfig(warmup_lr=0.0, min_lr=1e-5, warmup_epochs=0)
    floor = 3e-4
    _, s = build_search_optimizer(
        fam, fam, fam, sched, total_steps=100, steps_per_epoch=10,
        sched_arch=dataclasses.replace(sched, min_lr=floor))
    # evaluate past the horizon, where the cosine clamps to its floor
    assert float(s["arch"](150)) == pytest.approx(floor, rel=1e-3)
    assert float(s["param"](150)) == pytest.approx(1e-5, rel=1e-3)
    assert float(s["decoder"](150)) == pytest.approx(1e-5, rel=1e-3)
    # identical at the peak: the floor only reshapes the tail
    assert float(s["arch"](0)) == pytest.approx(float(s["param"](0)),
                                                rel=1e-6)


def test_checkpoint_async_serialized_and_atomic(tmp_path):
    """Back-to-back async saves to the SAME dir must not interleave (the
    second joins the first), parts are written tmp+rename, and the final
    state is the last save's."""
    from ofb_tpu.core import checkpoint as ckpt
    space, params, alphas, arch = tiny()
    d = str(tmp_path / "running")
    for epoch in range(3):
        bumped = jax.tree_util.tree_map(lambda x: x + epoch, params)
        ckpt.save_checkpoint(d, params=bumped, meta={"epoch": epoch},
                             async_write=True)
    ckpt.wait_for_pending_saves()
    # no stray tmp files left behind
    assert not [f for f in os.listdir(d) if f.endswith(".tmp")]
    p2 = init_mim_params(jax.random.PRNGKey(42), CFG, space)
    r = ckpt.load_checkpoint(d, params=p2)
    assert r["meta"]["epoch"] == 2
    np.testing.assert_array_equal(
        np.asarray(r["params"]["cls_token"]),
        np.asarray(params["cls_token"]) + 2)


def test_plateau_scale_shrinks_updates():
    """End-to-end plateau path: tracker decays after patience epochs
    without improvement and the with_lr_scale wrapper shrinks the actual
    optimizer updates by that factor (round-1 VERDICT weak #5)."""
    from ofb_tpu.core.optim import set_lr_scale, with_lr_scale
    tx = with_lr_scale(optax.sgd(1.0))
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    g = {"w": jnp.ones((3,))}
    u1, st = tx.update(g, st, params)

    tr = PlateauTracker(patience=1, decay_rate=0.1)
    assert tr.update(50.0) == 1.0       # first metric = best
    assert tr.update(49.0) == 1.0       # bad epoch 1 (within patience)
    scale = tr.update(48.0)             # bad epoch 2 -> decay
    assert scale == pytest.approx(0.1)

    st = set_lr_scale(st, scale)
    u2, _ = tx.update(g, st, params)
    np.testing.assert_allclose(np.asarray(u2["w"]),
                               np.asarray(u1["w"]) * 0.1, rtol=1e-6)


def test_make_schedule_rejects_unknown():
    from ofb_tpu.core.optim import make_schedule
    with pytest.raises(ValueError):
        make_schedule(1e-3, ScheduleConfig(sched="nope"), 100, 10)
    # plateau/constant are valid: warmup prefix, then constant in-graph
    # (the plateau decay rides the lr_scale slot)
    fn = make_schedule(1e-3, ScheduleConfig(sched="plateau",
                                            warmup_epochs=0), 100, 10)
    assert float(fn(0)) == float(fn(99)) == pytest.approx(1e-3)


def test_distributed_indices_drop_last():
    from ofb_tpu.data.samplers import distributed_indices
    parts = [distributed_indices(10, 0, r, 4, drop_last=True)
             for r in range(4)]
    assert all(len(p) == 2 for p in parts)          # floor(10/4) each
    covered = np.concatenate(parts)
    assert len(set(covered.tolist())) == 8          # tail dropped, no dups


def test_checkpoint_orbax_backend_roundtrip(tmp_path, monkeypatch):
    """Orbax backend: same artifact layout (parts + meta.json), selected by
    OFB_CKPT_BACKEND=orbax; restores through the generic load_checkpoint
    (backend recorded in meta). Covers sharded trees: params saved as
    device arrays on the 8-device mesh restore equal."""
    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.parallel.mesh import make_mesh, replicate
    space, params, alphas, arch = tiny()
    mesh = make_mesh()
    sharded = replicate(mesh, params)
    d = str(tmp_path / "orbax_ckpt")
    monkeypatch.setenv("OFB_CKPT_BACKEND", "orbax")
    ckpt.save_checkpoint(d, params=sharded, alphas=alphas, arch=arch,
                         meta={"epoch": 7})
    monkeypatch.delenv("OFB_CKPT_BACKEND")
    assert ckpt.latest_meta(d)["backend"] == "orbax"
    p2 = init_mim_params(jax.random.PRNGKey(42), CFG, space)
    a2 = init_alphas(jax.random.PRNGKey(43), space)
    r = ckpt.load_checkpoint(d, params=p2, alphas=a2,
                             arch=ArchState.create(space))
    assert r["meta"]["epoch"] == 7
    np.testing.assert_allclose(np.asarray(r["params"]["cls_token"]),
                               np.asarray(params["cls_token"]))
    np.testing.assert_array_equal(np.asarray(r["alphas"]["embed"]),
                                  np.asarray(alphas["embed"]))
    np.testing.assert_array_equal(np.asarray(r["arch"].embed.hard_mask),
                                  np.asarray(arch.embed.hard_mask))


def test_checkpoint_orbax_async_joined(tmp_path, monkeypatch):
    """Async orbax saves must be joinable via wait_for_pending_saves so a
    process exit never truncates a write."""
    from ofb_tpu.core import checkpoint as ckpt
    space, params, alphas, arch = tiny()
    d = str(tmp_path / "orbax_async")
    monkeypatch.setenv("OFB_CKPT_BACKEND", "orbax")
    ckpt.save_checkpoint(d, params=params, meta={"epoch": 3},
                         async_write=True)
    monkeypatch.delenv("OFB_CKPT_BACKEND")
    ckpt.wait_for_pending_saves()
    p2 = init_mim_params(jax.random.PRNGKey(42), CFG, space)
    r = ckpt.load_checkpoint(d, params=p2)
    assert r["meta"]["epoch"] == 3
    np.testing.assert_allclose(np.asarray(r["params"]["cls_token"]),
                               np.asarray(params["cls_token"]))


def test_plateau_schedule_has_warmup():
    """plateau/constant schedules must apply the warmup prefix like timm's
    PlateauLRScheduler (reference lr_sched.py:106-121)."""
    from ofb_tpu.core.optim import make_schedule
    sc = ScheduleConfig(sched="plateau", warmup_lr=1e-6, min_lr=0.0,
                        warmup_epochs=2)
    fn = make_schedule(1e-3, sc, total_steps=100, steps_per_epoch=10)
    assert float(fn(0)) == pytest.approx(1e-6)
    assert float(fn(10)) == pytest.approx((1e-6 + 1e-3) / 2, rel=1e-2)
    assert float(fn(20)) == pytest.approx(1e-3)
    assert float(fn(99)) == pytest.approx(1e-3)


def test_checkpoint_orbax_async_serialized_same_path(tmp_path, monkeypatch):
    """Back-to-back async orbax saves to the same dir must serialize (the
    second joins the first) and meta must land only after the parts."""
    from ofb_tpu.core import checkpoint as ckpt
    space, params, alphas, arch = tiny()
    d = str(tmp_path / "orbax_running")
    monkeypatch.setenv("OFB_CKPT_BACKEND", "orbax")
    for epoch in range(3):
        bumped = jax.tree_util.tree_map(lambda x: x + epoch, params)
        ckpt.save_checkpoint(d, params=bumped, meta={"epoch": epoch},
                             async_write=True)
    monkeypatch.delenv("OFB_CKPT_BACKEND")
    ckpt.wait_for_pending_saves()
    p2 = init_mim_params(jax.random.PRNGKey(42), CFG, space)
    r = ckpt.load_checkpoint(d, params=p2)
    assert r["meta"]["epoch"] == 2
    np.testing.assert_allclose(np.asarray(r["params"]["cls_token"]),
                               np.asarray(params["cls_token"]) + 2)
