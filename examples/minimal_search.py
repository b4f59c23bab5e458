"""Minimal end-to-end OFB walkthrough with the library API.

Builds a tiny searchable supernet, runs a few search steps with the real
three-family optimizer, fires the compress state machine, force-finishes,
exports the pruned subnet and runs one finetune step — the whole
search -> prune -> export -> finetune lifecycle in ~a minute on CPU.

Run:  python examples/minimal_search.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    # force CPU when a remote TPU backend is registered (see CLAUDE.md)
    if os.environ.get("OFB_EXAMPLE_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    from ofb_tpu.config import OptimFamilyConfig, ScheduleConfig, SearchConfig
    from ofb_tpu.core.compress import compress
    from ofb_tpu.core.export import export_subnet, exported_param_count
    from ofb_tpu.core.lr_decay import build_finetune_optimizer
    from ofb_tpu.core.optim import build_search_optimizer, make_schedule
    from ofb_tpu.core.steps import (TrainState, make_search_step,
                                    make_train_step)
    from ofb_tpu.models.registry import ModelBundle
    from ofb_tpu.models.search_space import SearchSpace
    from ofb_tpu.models.vit import ModelCfg
    from ofb_tpu.ops.flops import model_flops

    # 1) a tiny searchable DeiT-style supernet
    cfg = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                   depth=2, num_heads=2, mlp_ratio=2.0)
    space = SearchSpace.build(cfg.embed_dim, cfg.depth, cfg.num_heads,
                              cfg.hidden, cfg.num_patches, patch_search=True)
    bundle = ModelBundle(name="tiny_mim", cfg=cfg, kind="mim", space=space)
    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    dense_g = float(model_flops(alphas, arch, space, cfg)[0])
    print(f"dense model: {dense_g * 1e3:.3f}e-3 GFLOPs")

    # 2) three-family optimizer + jitted search step
    scfg = SearchConfig(accum_iter=1, target_flops=dense_g * 0.6,
                        schedule=ScheduleConfig(warmup_epochs=0),
                        optim_param=OptimFamilyConfig(lr=1e-3),
                        optim_decoder=OptimFamilyConfig(lr=1e-3),
                        optim_arch=OptimFamilyConfig(lr=2e-3,
                                                     betas=(0.5, 0.999))
                        ).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=100, steps_per_epoch=10)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))
    step = make_search_step(space, cfg, scfg, tx, phase="search",
                            compute_dtype=jnp.float32, donate=False)

    rng = jax.random.PRNGKey(1)
    imgs = jax.random.uniform(rng, (1, 8, 32, 32, 3))
    lbls = jax.random.randint(rng, (1, 8), 0, 10)
    for i in range(5):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, imgs, lbls, sub, jnp.asarray(0.85))
    print(f"after 5 search steps: loss_total={float(metrics['loss_total']):.3f} "
          f"searched={float(metrics['searched_gflops']) * 1e3:.3f}e-3 G")

    # 3) compress events (here: force-finish like the reference's
    #    compress(1.0) pre-export, finetune.py:199-201)
    p, a, ar = (jax.device_get(state.params), jax.device_get(state.alphas),
                state.arch)
    guard = 0
    while not ar.all_finished and guard < 20:
        p, a, ar, _, rep = compress(p, a, ar, None, space, thresh=1.0)
        guard += 1
    print("converged; events from last pass:", rep.events[:3], "...")

    # 4) export the physically-small subnet
    dense, dense_cfg, meta = export_subnet(p, ar, space, cfg, fuse=True)
    print(f"exported: D={dense_cfg.embed_dim}, "
          f"blocks={dense_cfg.block_overrides}, "
          f"params={exported_param_count(dense) / 1e3:.1f}K")

    # 5) one finetune step on the exported model
    sched = make_schedule(1e-4, ScheduleConfig(warmup_epochs=0), 100, 10)
    ftx = build_finetune_optimizer(dense, lr_schedule=sched,
                                   layer_decay=0.95,
                                   num_layers=dense_cfg.depth)
    fstate = TrainState(step=jnp.asarray(0, jnp.int32), params=dense,
                        alphas=None, arch=None, opt_state=ftx.init(dense))
    fstep = make_train_step(dense_cfg, ftx, num_classes=10,
                            compute_dtype=jnp.float32)
    fstate, fm = fstep(fstate, imgs, lbls, jax.random.PRNGKey(2))
    print(f"finetune step on exported model: loss={float(fm['loss']):.3f}")
    print("OK")


if __name__ == "__main__":
    main()
