"""End-to-end OFB compression story: search a supernet to high accuracy on
an 8-class synthetic task (quadrant x dominant-channel), with the compress
state machine pruning organically during training; force-finish + export
the physically-small subnet; measure accuracy through hard pruning and a
short finetune.

Representative TPU v5e result (1500 search steps, ~4 min):
    supernet 100.0% -> hard-pruned exported 100.0% -> finetuned 100.0%
    at 34% of dense FLOPs (115K -> 69K params), with heterogeneous
    per-block dims discovered, e.g. ((2,24,32), (2,8,48), (2,28,112)).

Run:  python examples/compression_story.py [--steps 1500]
(CPU works too with --steps 300; set OFB_STORY_CPU=1.)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if os.environ.get("OFB_STORY_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from ofb_tpu.config import SearchConfig, ScheduleConfig, OptimFamilyConfig
from ofb_tpu.core.compress import compress
from ofb_tpu.core.export import export_subnet, exported_param_count
from ofb_tpu.core.lr_decay import build_finetune_optimizer
from ofb_tpu.core.optim import build_search_optimizer, make_schedule
from ofb_tpu.core.steps import (TrainState, make_eval_step,
                                make_eval_step_dense, make_search_step,
                                make_train_step)
from ofb_tpu.models.registry import ModelBundle
from ofb_tpu.models.search_space import SearchSpace
from ofb_tpu.models.vit import ModelCfg
from ofb_tpu.ops.flops import model_flops

cfg = ModelCfg(img_size=32, patch_size=8, num_classes=8, embed_dim=64,
               depth=3, num_heads=2, mlp_ratio=2.0)
space = SearchSpace.build(cfg.embed_dim, cfg.depth, cfg.num_heads,
                          cfg.hidden, cfg.num_patches, patch_search=True)
bundle = ModelBundle(name="t", cfg=cfg, kind="mim", space=space)
params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
dense_g = float(model_flops(alphas, arch, space, cfg)[0])

def make_batch(rng, n):
    """label = quadrant(4) x dominant-channel(2)."""
    k1, k2 = jax.random.split(rng)
    imgs = jax.random.uniform(k1, (n, 32, 32, 3)) * 0.3
    lbl = jax.random.randint(k2, (n,), 0, 8)
    q, ch = lbl // 2, (lbl % 2) * 2      # channel 0 or 2
    yy = jnp.arange(32)[None, :, None]
    xx = jnp.arange(32)[None, None, :]
    mask = (((yy // 16) == (q // 2)[:, None, None]) &
            ((xx // 16) == (q % 2)[:, None, None]))
    bump = jnp.zeros((n, 32, 32, 3))
    bump = bump.at[jnp.arange(n), :, :, ch].set(0.5)
    imgs = jnp.where(mask[..., None], imgs + bump, imgs)
    return imgs.astype(jnp.float32), lbl

scfg = SearchConfig(accum_iter=1, target_flops=dense_g * 0.55,
                    w_flops=5.0,
                    schedule=ScheduleConfig(warmup_epochs=3),
                    optim_param=OptimFamilyConfig(lr=1e-3),
                    optim_decoder=OptimFamilyConfig(lr=1e-3),
                    optim_arch=OptimFamilyConfig(lr=4e-3, betas=(0.5, 0.999))
                    ).resolve(1)
ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=1500)
ap.add_argument("--finetune-steps", type=int, default=600)
cli = ap.parse_args()
STEPS = cli.steps
tx, _ = build_search_optimizer(scfg.optim_param, scfg.optim_arch,
                               scfg.optim_decoder, scfg.schedule,
                               total_steps=STEPS, steps_per_epoch=100)
state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                   alphas=alphas, arch=arch,
                   opt_state=tx.init((params, alphas)))
step = make_search_step(space, cfg, scfg, tx, phase="search",
                        compute_dtype=jnp.bfloat16, donate=False)
ev = make_eval_step(space, cfg, compute_dtype=jnp.bfloat16)
VI, VL = make_batch(jax.random.PRNGKey(999), 1024)

def sup_acc(st):
    m = ev(st.params, st.alphas, st.arch, VI, VL)
    return 100.0 * float(m["top1"]) / 1024

rng = jax.random.PRNGKey(7)
t0 = time.time()
from ofb_tpu.core.compress import compress as comp, update_w_p
finish = False
for it in range(STEPS):
    frac = it / 100.0
    state = state.replace(arch=update_w_p(state.arch, frac, 3.0))
    keep = 0.95 - 0.2 * min(frac / 3.0, 1.0)
    rng, kb, ks = jax.random.split(rng, 3)
    imgs, lbl = make_batch(kb, 128)
    state, m = step(state, imgs[None], lbl[None], ks, jnp.asarray(keep))
    if not finish and (it + 1) % 33 == 0:
        p, a, ar, o, rep = comp(state.params, state.alphas, state.arch,
                                state.opt_state, space, 0.2)
        state = state.replace(params=p, alphas=a, arch=ar, opt_state=o)
        finish = rep.finish_search
        if rep.events:
            print(f"it {it+1}: {len(rep.events)} prune events "
                  f"({rep.events[0]} ...)", flush=True)
    if (it + 1) % 300 == 0:
        _, sg = model_flops(jax.device_get(state.alphas), state.arch, space, cfg)
        print(f"it {it+1}: supernet acc {sup_acc(state):.1f}% "
              f"searched {float(sg)/dense_g*100:.0f}% of dense "
              f"loss {float(m['loss_param']):.3f}", flush=True)

acc_supernet = sup_acc(state)
print(f"\nsupernet acc after search: {acc_supernet:.1f}% "
      f"(wall {time.time()-t0:.0f}s)", flush=True)

# force-finish + export
p, a, ar = (jax.device_get(state.params), jax.device_get(state.alphas),
            state.arch)
g = 0
while not ar.all_finished and g < 20:
    p, a, ar, _, _ = comp(p, a, ar, None, space, thresh=1.0)
    g += 1
dense, dense_cfg, _ = export_subnet(p, ar, space, cfg, fuse=True)
_, sg = model_flops(a, ar, space, cfg)
n_full = exported_param_count({k: v for k, v in p.items()
                               if k not in ("decoder", "mask_token")})
n_small = exported_param_count(dense)
print(f"exported: D={dense_cfg.embed_dim} blocks={dense_cfg.block_overrides} "
      f"params {n_full/1e3:.0f}K -> {n_small/1e3:.0f}K "
      f"flops {float(sg)/dense_g*100:.0f}% of dense", flush=True)

evd = make_eval_step_dense(dense_cfg, compute_dtype=jnp.bfloat16)
def dense_acc(pp):
    m = evd(pp, VI, VL)
    return 100.0 * float(m["top1"]) / 1024
acc_exported = dense_acc(dense)
print(f"exported (no finetune): {acc_exported:.1f}%", flush=True)

# finetune the exported subnet
sched = make_schedule(5e-4, ScheduleConfig(warmup_epochs=0), 600, 100)
ftx = build_finetune_optimizer(dense, lr_schedule=sched, layer_decay=0.95,
                               num_layers=dense_cfg.depth)
fstate = TrainState(step=jnp.asarray(0, jnp.int32), params=dense,
                    alphas=None, arch=None, opt_state=ftx.init(dense))
fstep = make_train_step(dense_cfg, ftx, num_classes=8,
                        compute_dtype=jnp.bfloat16)
for it in range(cli.finetune_steps):
    rng, kb, ks = jax.random.split(rng, 3)
    imgs, lbl = make_batch(kb, 128)
    fstate, fm = fstep(fstate, imgs[None], lbl[None], ks)
acc_ft = dense_acc(fstate.params)
print(f"exported + {cli.finetune_steps} finetune steps: {acc_ft:.1f}%", flush=True)
print(f"\nSTORY: supernet {acc_supernet:.1f}% -> hard-pruned "
      f"{acc_exported:.1f}% -> finetuned {acc_ft:.1f}% at "
      f"{float(sg)/dense_g*100:.0f}% FLOPs", flush=True)
