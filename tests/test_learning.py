"""Functional learning test: the full search step (gates + PMIM + arch
losses + three-family optimizer) must actually LEARN a trivial task —
4-class 'brightest quadrant' — well above chance with fresh batches.

This is the plumbing test the reference lacks (SURVEY §4: its only
correctness signal is live accuracy); it catches silent failures like
zeroed updates, misaligned labels, or broken gate gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofb_tpu.config import OptimFamilyConfig, ScheduleConfig, SearchConfig
from ofb_tpu.core.optim import build_search_optimizer
from ofb_tpu.core.steps import TrainState, make_eval_step, make_search_step
from ofb_tpu.models.registry import ModelBundle
from ofb_tpu.models.search_space import SearchSpace
from ofb_tpu.models.vit import ModelCfg

CFG = ModelCfg(img_size=16, patch_size=4, num_classes=4, embed_dim=32,
               depth=1, num_heads=2, mlp_ratio=2.0)


def make_batch(rng, n):
    """Images in the normalized domain; label = brightest quadrant."""
    k1, k2 = jax.random.split(rng)
    imgs = jax.random.uniform(k1, (n, 16, 16, 3)) * 0.3
    lbl = jax.random.randint(k2, (n,), 0, 4)
    qy, qx = lbl // 2, lbl % 2
    yy = jnp.arange(16)[None, :, None, None]
    xx = jnp.arange(16)[None, None, :, None]
    mask = ((yy // 8) == qy[:, None, None, None]) & \
           ((xx // 8) == qx[:, None, None, None])
    return jnp.where(mask, imgs + 0.6, imgs).astype(jnp.float32), lbl


def test_search_step_learns():
    space = SearchSpace.build(CFG.embed_dim, CFG.depth, CFG.num_heads,
                              CFG.hidden, CFG.num_patches, patch_search=True)
    bundle = ModelBundle(name="t", cfg=CFG, kind="mim", space=space)
    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    scfg = SearchConfig(
        accum_iter=1, target_flops=0.0002,
        schedule=ScheduleConfig(warmup_epochs=0),
        optim_param=OptimFamilyConfig(lr=1e-3),
        optim_decoder=OptimFamilyConfig(lr=1e-3),
        optim_arch=OptimFamilyConfig(lr=1e-3, betas=(0.5, 0.999)),
    ).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=2000, steps_per_epoch=100)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))
    step = make_search_step(space, CFG, scfg, tx, phase="search",
                            compute_dtype=jnp.float32, donate=False)
    ev = make_eval_step(space, CFG, compute_dtype=jnp.float32)

    rng = jax.random.PRNGKey(7)
    for it in range(250):
        rng, kb, ks = jax.random.split(rng, 3)
        imgs, lbl = make_batch(kb, 32)
        state, m = step(state, imgs[None], lbl[None], ks, jnp.asarray(0.85))
    vi, vl = make_batch(jax.random.PRNGKey(99), 256)
    em = ev(state.params, state.alphas, state.arch, vi, vl)
    acc = 100.0 * float(em["top1"]) / 256
    assert acc > 60.0, f"search step failed to learn: {acc:.1f}%"
