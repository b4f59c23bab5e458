"""Benchmark: DeiT-S OFB search-step throughput on one TPU chip.

Measures the full search-mode training step (gated supernet forward incl.
PMIM decoder + all four loss families + backward + three-family AdamW) —
the hot loop of reference engine.py:75-219 — in images/sec/chip.

Baseline (vs_baseline): the reference publishes no throughput (SURVEY §6);
BASELINE.json's north star is ">=3x the 2-GPU reference throughput on a
v4-8 slice". We estimate the reference search throughput at 250 img/s per
A100-class GPU (DeiT-S fwd+bwd ~4.6 GFLOPs x 3, plus supernet gate/decoder
overhead, batch 128, fp16) -> 2-GPU total 500 img/s -> 3x target on 8 chips
= 1500 img/s -> per-chip target 187.5 img/s. vs_baseline = measured / 187.5.

Usage: python bench.py [--tiny] [--batch N] [--steps N]
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import time

import numpy as np


PER_CHIP_TARGET_IMG_S = 187.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CI / CPU smoke)")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--phase", default="search")
    ap.add_argument("--model", default="deit_small",
                    choices=["deit_small", "deit_base", "deit_tiny",
                             "swin_tiny", "swin_small", "swin_base"])
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint per block (memory for FLOPs)")
    ap.add_argument("--fused-augment", action="store_true",
                    help="end-to-end: uint8 staging batch -> device "
                         "RandAugment -> search step in ONE XLA program")
    ap.add_argument("--no-dense", action="store_true",
                    help="skip the dense-step companion measurement")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ofb_tpu.config import SearchConfig
    from ofb_tpu.core.optim import build_search_optimizer
    from ofb_tpu.core.steps import TrainState, make_search_step
    from ofb_tpu.models.registry import create_model

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    is_swin = args.model.startswith("swin")

    if is_swin:
        return bench_swin(args, on_tpu)

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
        # per-model optimum from the batch sweep (BENCH.md): DeiT-B peaks
        # at 64 (823 img/s; 128 -> 801, 192 -> 641, 256 OOMs without remat)
        batch = args.batch or (256 if args.model != "deit_base" else 64)
        compute = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    params, alphas, arch = bundle.init(key)

    scfg = SearchConfig(accum_iter=1, target_flops=1.0).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=100000, steps_per_epoch=1000)
    opt_state = tx.init((params, alphas))
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch, opt_state=opt_state)

    step = make_search_step(bundle.space, bundle.cfg, scfg, tx,
                            phase=args.phase, compute_dtype=compute,
                            donate=False, fused_augment=args.fused_augment)

    H = bundle.cfg.img_size
    rng = jax.random.PRNGKey(1)
    if args.fused_augment:
        S = max(H + 32, 256) if H >= 224 else H    # staging size
        imgs = jnp.asarray(np.random.RandomState(0).randint(
            0, 255, (1, batch, S, S, 3), np.uint8))
    else:
        imgs = jnp.asarray(np.random.RandomState(0).rand(1, batch, H, H, 3),
                           jnp.float32)
    lbls = jnp.asarray(
        np.random.RandomState(1).randint(0, bundle.cfg.num_classes,
                                         (1, batch)))
    keep = jnp.asarray(0.75)

    # warmup / compile. NOTE: on the remote-relay TPU backend
    # block_until_ready does not reliably wait for chained async execution;
    # a scalar host readback (device->host copy of the value) does.
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, imgs, lbls, sub, keep)
    float(metrics["loss_total"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, imgs, lbls, sub, keep)
    sync = float(metrics["loss_total"])
    dt = time.perf_counter() - t0
    assert np.isfinite(sync)

    img_s = batch * args.steps / dt

    # MFU: fwd MACs of the dense supernet from the differentiable FLOPs
    # model; train step ~ 3x fwd (bwd ~ 2x), FLOPs = 2 x MACs.
    # v5e peak 197 TFLOPs/s bf16.
    from ofb_tpu.ops.flops import model_flops
    total_gmacs, _ = model_flops(jax.device_get(alphas), arch, bundle.space,
                                 bundle.cfg)
    flops_per_img = 6.0 * float(total_gmacs) * 1e9
    mfu = img_s * flops_per_img / 197e12

    # dense supervised companion (same arch, plain AdamW) — makes the
    # search-overhead claim self-describing in the bench JSON
    dense_img_s = None
    if not (args.no_dense or args.fused_augment or args.tiny or not on_tpu):
        import optax
        from ofb_tpu.core.steps import make_train_step
        from ofb_tpu.models.vit import init_vit_params
        dparams = init_vit_params(jax.random.PRNGKey(2), bundle.cfg)
        dtx = optax.adamw(1e-4)
        dstep = make_train_step(bundle.cfg, dtx,
                                num_classes=bundle.cfg.num_classes,
                                compute_dtype=compute, donate=False)
        dstate = TrainState(step=jnp.asarray(0, jnp.int32), params=dparams,
                            alphas=None, arch=None,
                            opt_state=dtx.init(dparams))
        dimgs = imgs[..., :H, :H, :].astype(jnp.float32) / 255.0 \
            if imgs.dtype == jnp.uint8 else imgs
        for _ in range(3):
            dstate, dm = dstep(dstate, dimgs, lbls, rng)
        float(dm["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            dstate, dm = dstep(dstate, dimgs, lbls, rng)
        float(dm["loss"])
        dense_img_s = batch * args.steps / (time.perf_counter() - t0)

    name = ("tiny" if (args.tiny or not on_tpu)
            else {"deit_small": "deit_s", "deit_base": "deit_b",
                  "deit_tiny": "deit_t"}[args.model])
    if args.fused_augment:
        name += "_e2e"
    out = {
        "metric": f"{name}_ofb_search_step_throughput",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / PER_CHIP_TARGET_IMG_S, 3),
        # the 187.5 img/s/chip denominator is an ESTIMATE (the reference
        # publishes no throughput — see module docstring / BASELINE.md)
        "baseline_estimated": True,
        "mfu": round(mfu, 4),
        "batch": batch,
    }
    if dense_img_s is not None:
        out["dense_img_s"] = round(dense_img_s, 2)
        out["search_overhead_vs_dense"] = round(dense_img_s / img_s - 1.0, 4)
    print(json.dumps(out))


def bench_swin(args, on_tpu):
    """OFB-Swin search-step throughput (window attention + MLP bi-mask
    search over the Swin family — reference README.md:27-31's unreleased
    OFB-Swin, rebuilt here)."""
    import jax
    import jax.numpy as jnp
    from ofb_tpu.config import SearchConfig
    from ofb_tpu.core.optim import build_search_optimizer
    from ofb_tpu.core.steps import TrainState
    from ofb_tpu.core.swin_steps import make_swin_search_step
    from ofb_tpu.models.registry import create_model
    from ofb_tpu.models.swin_search import swin_model_flops

    bundle = create_model(f"{args.model}_patch4_window7_224_mim",
                          embed_search=True)
    batch = args.batch or 128
    compute = jnp.bfloat16 if on_tpu else jnp.float32

    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    scfg = SearchConfig(accum_iter=1, target_flops=1.0).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=100000, steps_per_epoch=1000)
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))
    step = make_swin_search_step(bundle.space, bundle.cfg, scfg, tx,
                                 phase="search", compute_dtype=compute,
                                 donate=False)

    H = bundle.cfg.img_size
    rng = jax.random.PRNGKey(1)
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, batch, H, H, 3),
                       jnp.float32)
    lbls = jnp.asarray(np.random.RandomState(1).randint(
        0, bundle.cfg.num_classes, (1, batch)))

    for _ in range(3):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, imgs, lbls, sub)
    float(metrics["loss_total"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, imgs, lbls, sub)
    sync = float(metrics["loss_total"])
    dt = time.perf_counter() - t0
    assert np.isfinite(sync)

    img_s = batch * args.steps / dt
    total_gmacs, _ = swin_model_flops(jax.device_get(alphas), arch,
                                      bundle.space, bundle.cfg)
    mfu = img_s * 6.0 * float(total_gmacs) * 1e9 / 197e12

    # dense-Swin supervised companion: the A/B that proves (or refutes)
    # "Swin search MFU is shape-bound" the way the DeiT path did
    dense_img_s = dense_mfu = None
    if not args.no_dense:
        import optax
        from ofb_tpu.core.swin_steps import make_swin_train_step_dense
        from ofb_tpu.models.swin import init_swin_params
        dparams = init_swin_params(jax.random.PRNGKey(2), bundle.cfg)
        dtx = optax.adamw(1e-4)
        dstep = make_swin_train_step_dense(bundle.cfg, dtx,
                                           compute_dtype=compute)
        dstate = TrainState(step=jnp.asarray(0, jnp.int32), params=dparams,
                            alphas=None, arch=None,
                            opt_state=dtx.init(dparams))
        for _ in range(3):
            dstate, dm = dstep(dstate, imgs, lbls, rng)
        float(dm["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            dstate, dm = dstep(dstate, imgs, lbls, rng)
        float(dm["loss"])
        dense_img_s = batch * args.steps / (time.perf_counter() - t0)
        dense_mfu = dense_img_s * 6.0 * float(total_gmacs) * 1e9 / 197e12

    out = {
        "metric": f"{args.model}_ofb_search_step_throughput",
        "value": round(img_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s / PER_CHIP_TARGET_IMG_S, 3),
        "baseline_estimated": True,
        "mfu": round(mfu, 4),
        "batch": batch,
    }
    if dense_img_s is not None:
        out["dense_img_s"] = round(dense_img_s, 2)
        out["dense_mfu"] = round(dense_mfu, 4)
        out["search_overhead_vs_dense"] = round(dense_img_s / img_s - 1.0, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
