"""Swin dense-step component breakdown by ablation (TPU).

The relay makes trace-based profiling unreliable (see perf_breakdown.py),
so this times the dense Swin train step with components stubbed out:

  full            the real step (OFB_SWIN_PACK honored)
  no_attn         _window_attention -> proj only (isolates qkv+attn+bias)
  no_shift        all blocks unshifted (isolates the jnp.roll pairs)
  no_mlp          MLP branch skipped (isolates fc1/gelu/fc2)

Each ablation changes FLOPs, so img/s deltas are read as "what fraction
of step time lives in that component", not as achievable speedups.

Usage: python scripts/swin_breakdown.py [--model swin_tiny] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="swin_tiny")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    import ofb_tpu.models.swin as swin_mod
    from ofb_tpu.core.steps import TrainState
    from ofb_tpu.core.swin_steps import make_swin_train_step_dense
    from ofb_tpu.models.registry import create_model

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    compute = jnp.bfloat16 if on_tpu else jnp.float32
    bundle = create_model(f"{args.model}_patch4_window7_224_mim",
                          embed_search=True)
    cfg = bundle.cfg
    params = swin_mod.init_swin_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(1e-4)

    B = args.batch
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, B, cfg.img_size,
                                                     cfg.img_size, 3),
                       jnp.float32)
    lbls = jnp.asarray(np.random.RandomState(1).randint(
        0, cfg.num_classes, (1, B)))

    real_attn = swin_mod._window_attention
    from ofb_tpu.models.vit import linear as _linear

    def run(tag):
        step = make_swin_train_step_dense(cfg, tx, compute_dtype=compute)
        st = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                        alphas=None, arch=None, opt_state=tx.init(params))
        rng = jax.random.PRNGKey(2)
        for _ in range(3):
            st, m = step(st, imgs, lbls, rng)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            st, m = step(st, imgs, lbls, rng)
        float(m["loss"])
        dt = time.perf_counter() - t0
        r = B * args.steps / dt
        print(f"{tag:>10}: {r:8.1f} img/s  ({dt / args.steps * 1e3:.1f} "
              f"ms/step)", flush=True)
        return r

    out = {}
    out["full"] = run("full")

    def attn_stub(p, x, heads, w, rel_idx, mask, pack=1):
        return _linear(p["proj"], x)
    swin_mod._window_attention = attn_stub
    out["no_attn"] = run("no_attn")
    swin_mod._window_attention = real_attn

    # no_roll: cyclic shifts become identity (keeps every matmul; isolates
    # the 4 rolls/shifted-block of lane/sublane movement)
    import types
    shim = types.SimpleNamespace()
    shim.__dict__.update(jnp.__dict__)
    shim.roll = lambda x, shift, axis=None: x
    swin_mod.jnp = shim
    try:
        out["no_roll"] = run("no_roll")
    finally:
        swin_mod.jnp = jnp

    print(json.dumps({k: round(v, 1) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
