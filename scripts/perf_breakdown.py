"""Component-level timing of the OFB step on the real chip.

The relay makes trace-based profiling unreliable (async dispatch + remote
compile), so the breakdown is measured directly: each row is a jitted
subset of the work, timed with host-readback sync, reported as img/s and
MFU (v5e bf16 peak 197 TFLOPs/s). Rows:

  eval_fwd      gated supernet forward, no MIM, no grad
  search_step   the full search train step (fwd + 4 loss families + bwd +
                three-family AdamW) — the bench.py headline
  dense_step    plain supervised train step on the same dense ViT (no
                gates/decoder/arch-loss) — isolates the search machinery

Usage: python scripts/perf_breakdown.py [--tiny] [--model deit_small]
           [--batch N] [--steps N] [--remat]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_FLOPS = 197e12      # v5e bf16


def time_fn(fn, sync, steps):
    fn()                  # compile + warm
    fn()
    sync()
    t0 = time.perf_counter()
    for _ in range(steps):
        fn()
    sync()
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--model", default="deit_small",
                    choices=["deit_small", "deit_base", "deit_tiny"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ofb_tpu.config import SearchConfig
    from ofb_tpu.core.optim import build_search_optimizer
    from ofb_tpu.core.steps import (TrainState, make_eval_step,
                                    make_search_step, make_train_step)
    from ofb_tpu.models.registry import create_model
    from ofb_tpu.ops.flops import model_flops

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if args.tiny or not on_tpu:
        from ofb_tpu.models.registry import ModelBundle
        from ofb_tpu.models.search_space import SearchSpace
        from ofb_tpu.models.vit import ModelCfg
        cfg = ModelCfg(img_size=32, patch_size=8, num_classes=16,
                       embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0)
        space = SearchSpace.build(cfg.embed_dim, cfg.depth, cfg.num_heads,
                                  cfg.hidden, cfg.num_patches,
                                  patch_search=True)
        bundle = ModelBundle(name="tiny", cfg=cfg, kind="mim", space=space)
        batch = args.batch or 8
        compute = jnp.float32
    else:
        bundle = create_model(f"{args.model}_patch16_224_mim",
                              patch_search=True)
        if args.remat:
            import dataclasses
            bundle.cfg = dataclasses.replace(bundle.cfg, remat=True)
        batch = args.batch or (256 if args.model != "deit_base" else 128)
        compute = jnp.bfloat16

    cfg, space = bundle.cfg, bundle.space
    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    scfg = SearchConfig(accum_iter=1, target_flops=1.0).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=100000, steps_per_epoch=1000)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))

    H = cfg.img_size
    imgs4 = jnp.asarray(np.random.RandomState(0).rand(batch, H, H, 3),
                        jnp.float32)
    imgs5 = imgs4[None]
    lbls = jnp.asarray(np.random.RandomState(1).randint(
        0, cfg.num_classes, (batch,)))
    lbls5 = lbls[None]
    keep = jnp.asarray(0.75)
    rng = jax.random.PRNGKey(1)

    gmacs, _ = model_flops(jax.device_get(alphas), arch, space, cfg)
    fwd_flops = 2.0 * float(gmacs) * 1e9          # FLOPs = 2 x MACs
    rows = {}

    # 1) forward only (eval step)
    ev = make_eval_step(space, cfg, compute_dtype=compute)
    m_hold = {}

    def run_eval():
        m_hold["m"] = ev(state.params, state.alphas, state.arch, imgs4, lbls)

    dt = time_fn(run_eval, lambda: float(m_hold["m"]["loss_sum"]),
                 args.steps)
    rows["eval_fwd"] = (batch / dt, batch / dt * fwd_flops / PEAK_FLOPS)

    # 2) full search step
    sstep = make_search_step(space, cfg, scfg, tx, phase="search",
                             compute_dtype=compute, donate=False)
    st_hold = {"s": state}

    def run_search():
        st_hold["s"], st_hold["m"] = sstep(st_hold["s"], imgs5, lbls5, rng,
                                           keep)

    dt = time_fn(run_search, lambda: float(st_hold["m"]["loss_total"]),
                 args.steps)
    rows["search_step"] = (batch / dt,
                           batch / dt * 3 * fwd_flops / PEAK_FLOPS)

    # 3) dense supervised step on the same architecture
    from ofb_tpu.models.vit import init_vit_params
    dparams = init_vit_params(jax.random.PRNGKey(2), cfg)
    import optax
    dtx = optax.adamw(1e-4)   # the dense baseline uses a plain AdamW
    dstep = make_train_step(cfg, dtx, num_classes=cfg.num_classes,
                            compute_dtype=compute, donate=False)
    dstate = TrainState(step=jnp.asarray(0, jnp.int32), params=dparams,
                        alphas=None, arch=None,
                        opt_state=dtx.init(dparams))
    dh = {"s": dstate}

    def run_dense():
        dh["s"], dh["m"] = dstep(dh["s"], imgs5, lbls5, rng)

    dt = time_fn(run_dense, lambda: float(dh["m"]["loss"]), args.steps)
    rows["dense_step"] = (batch / dt, batch / dt * 3 * fwd_flops / PEAK_FLOPS)

    # 4) search step without the PMIM decoder (mae off) — isolates the
    #    SimMIM decoder + masked-L1 + norm_targets cost
    from ofb_tpu.models.mim_vit import init_mim_params
    nm_params = init_mim_params(jax.random.PRNGKey(3), cfg, space, mae=False)
    nm_state = TrainState(step=jnp.asarray(0, jnp.int32), params=nm_params,
                          alphas=alphas, arch=arch,
                          opt_state=tx.init((nm_params, alphas)))
    nm_step = make_search_step(space, cfg, scfg, tx, phase="search",
                               compute_dtype=compute, donate=False)
    nh = {"s": nm_state}

    def run_nomim():
        nh["s"], nh["m"] = nm_step(nh["s"], imgs5, lbls5, rng, keep)

    dt = time_fn(run_nomim, lambda: float(nh["m"]["loss_total"]), args.steps)
    rows["search_no_mim"] = (batch / dt, batch / dt * 3 * fwd_flops
                             / PEAK_FLOPS)

    # 5) search step with a free optimizer (sgd lr=0) — the three-family
    #    AdamW's cost is the gap to search_step
    ztx = optax.sgd(0.0)
    zstate = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                        alphas=alphas, arch=arch,
                        opt_state=ztx.init((params, alphas)))
    zstep = make_search_step(space, cfg, scfg, ztx, phase="search",
                             compute_dtype=compute, donate=False)
    zh = {"s": zstate}

    def run_zopt():
        zh["s"], zh["m"] = zstep(zh["s"], imgs5, lbls5, rng, keep)

    dt = time_fn(run_zopt, lambda: float(zh["m"]["loss_total"]), args.steps)
    rows["search_sgd0"] = (batch / dt, batch / dt * 3 * fwd_flops
                           / PEAK_FLOPS)

    # 6) device augment pipeline alone (staging 256px uint8 -> RandAugment
    #    -> out_size), per-batch time expressed as img/s
    if not (args.tiny or not on_tpu):
        from ofb_tpu.ops.augment import train_augment_batch
        staged = jnp.asarray(np.random.RandomState(4).randint(
            0, 255, (batch, 256, 256, 3), np.uint8))
        aug = jax.jit(lambda r, im: train_augment_batch(
            r, im, out_size=cfg.img_size, use_randaug=True, re_prob=0.25))
        ah = {}

        def run_aug():
            ah["o"] = aug(rng, staged)

        dt = time_fn(run_aug, lambda: float(ah["o"].sum()), args.steps)
        rows["augment_only"] = (batch / dt, 0.0)

    out = {"model": bundle.name, "batch": batch,
           "rows": {k: {"img_s": round(v[0], 1), "mfu": round(v[1], 4)}
                    for k, v in rows.items()},
           "search_overhead_vs_dense": round(
               rows["dense_step"][0] / rows["search_step"][0] - 1.0, 4),
           "mim_decoder_cost": round(
               rows["search_no_mim"][0] / rows["search_step"][0] - 1.0, 4),
           "adamw_cost": round(
               rows["search_sgd0"][0] / rows["search_step"][0] - 1.0, 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
