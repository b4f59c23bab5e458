"""Worker for the real 2-process consensus/eval test (run by
tests/test_multiprocess.py, one subprocess per rank).

Exercises the genuine multi-host hazards (SURVEY §5.2, VERDICT round 1):
  * a sharded search step over a 2-process global mesh — the gradient
    all-reduce must keep the replicated alphas bitwise identical per host;
  * host-side compress on each process's addressable replica — prune
    decisions must agree with no extra collective;
  * `evaluate` over a rank-sharded val feed — the cross-process sum must
    make every host report full-set statistics.

Prints one JSON line with a decision digest + eval stats; the parent
asserts both ranks emit identical lines and that the eval matches a
single-process full-set run.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def eval_data(n=32, img=32, classes=10):
    """Deterministic tiny val set (same on every rank)."""
    import numpy as np
    rs = np.random.RandomState(1234)
    imgs = rs.rand(n, img, img, 3).astype(np.float32)
    lbls = rs.randint(0, classes, (n,))
    return imgs, lbls


def sharded_feed(rank, world, batch=8):
    imgs, lbls = eval_data()
    idx = list(range(rank, len(imgs), world))
    for i in range(0, len(idx), batch):
        sel = idx[i:i + batch]
        if len(sel) == batch:      # static shapes; tiny set divides evenly
            yield imgs[sel], lbls[sel]


def build():
    import jax.numpy as jnp
    from ofb_tpu.config import SearchConfig
    from ofb_tpu.core.optim import build_search_optimizer
    from ofb_tpu.core.steps import TrainState, make_search_step
    from ofb_tpu.models.registry import ModelBundle
    from ofb_tpu.models.search_space import SearchSpace
    from ofb_tpu.models.vit import ModelCfg

    cfg = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
                   depth=2, num_heads=2, mlp_ratio=2.0)
    space = SearchSpace.build(32, 2, 2, cfg.hidden, cfg.num_patches,
                              patch_search=True)
    bundle = ModelBundle(name="tiny", cfg=cfg, kind="mim", space=space)
    scfg = SearchConfig(accum_iter=1, target_flops=0.0002).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=100, steps_per_epoch=10)
    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))
    step = make_search_step(space, cfg, scfg, tx, phase="search",
                            compute_dtype=jnp.float32, donate=False)
    return bundle, state, step


def _half_batch(rank):
    import numpy as np
    rs = np.random.RandomState(100 + rank)
    return (rs.rand(1, 4, 32, 32, 3).astype(np.float32),
            rs.randint(0, 10, (1, 4)))


def main():
    single = sys.argv[1] == "single"
    rank = 0 if single else int(sys.argv[1])
    world = 1 if single else 2
    if not single:
        port = sys.argv[2]
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=2, process_id=rank)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ofb_tpu.core.compress import compress
    from ofb_tpu.core.engine import evaluate
    from ofb_tpu.core.steps import make_eval_step
    from ofb_tpu.parallel.mesh import make_mesh, replicate

    assert jax.process_count() == world

    mesh = make_mesh((world, 1))
    bundle, state, step = build()
    state = state.replace(params=replicate(mesh, state.params),
                          alphas=replicate(mesh, state.alphas),
                          arch=replicate(mesh, state.arch),
                          opt_state=replicate(mesh, state.opt_state))

    # global batch of 8: each process contributes ITS OWN half (different
    # data per host — the situation where per-host divergence would bite);
    # single mode concatenates both halves on the one device.
    bsh = NamedSharding(mesh, P(None, "data"))
    if single:
        i0, l0 = _half_batch(0)
        i1, l1 = _half_batch(1)
        imgs = jax.device_put(np.concatenate([i0, i1], axis=1), bsh)
        lbls = jax.device_put(np.concatenate([l0, l1], axis=1), bsh)
    else:
        loc_imgs, loc_lbls = _half_batch(rank)
        imgs = jax.make_array_from_process_local_data(bsh, loc_imgs)
        lbls = jax.make_array_from_process_local_data(bsh, loc_lbls)
    state, metrics = step(state, imgs, lbls, jax.random.PRNGKey(1),
                          jnp.asarray(0.8))
    assert np.isfinite(float(metrics["loss_total"]))

    # force one convergence, then compress host-side on the local replica
    alphas = jax.device_get(state.alphas)
    a = np.full_like(np.asarray(alphas["blocks"][0]["mlp"]), -8.0)
    a.reshape(-1)[1] = 8.0
    alphas["blocks"][0]["mlp"] = jnp.asarray(a)
    params = jax.device_get(state.params)
    arch = jax.tree_util.tree_map(jax.device_get, state.arch)
    _, _, new_arch, _, rep = compress(params, alphas, arch, None,
                                      bundle.space, 0.2)

    digest = hashlib.sha256()
    digest.update(repr(rep.events).encode())
    for blk in new_arch.blocks:
        digest.update(np.asarray(blk.mlp.switch).tobytes())
        digest.update(np.asarray(blk.mlp.hard_mask).tobytes())
        digest.update(np.asarray(blk.attn.switch).tobytes())
    digest.update(np.asarray(new_arch.embed.hard_mask).tobytes())

    # cross-host barrier fence (checkpoint-style) must not deadlock
    from ofb_tpu.parallel.distributed import barrier_sync
    if not single:
        barrier_sync("worker_fence")

    # multi-host orbax checkpoint: EVERY process participates in the save
    # (the backend's whole point — SURVEY §2.3's save_on_master analog for
    # sharded state); restore and digest to prove identical bytes per host
    ckpt_digest = None
    if not single and len(sys.argv) > 3:
        from ofb_tpu.core import checkpoint as ck
        ckdir = sys.argv[3]
        ck.save_checkpoint_orbax(ckdir, params=state.params,
                                 meta={"epoch": 1})
        barrier_sync("ckpt_committed")   # meta.json is process-0-only
        restored = ck.load_checkpoint_orbax(ckdir, params=state.params)
        pdig = hashlib.sha256()
        for leaf in jax.tree_util.tree_leaves(restored["params"]):
            pdig.update(np.asarray(leaf.addressable_data(0)).tobytes())
        ckpt_digest = pdig.hexdigest()

    # rank-sharded eval: every host must report FULL-set stats
    ev = make_eval_step(bundle.space, bundle.cfg, compute_dtype=jnp.float32)
    stats = evaluate(ev, sharded_feed(rank, world),
                     jax.device_get(state.params), alphas, arch,
                     print_fn=lambda *a, **k: None)

    print(json.dumps({"digest": digest.hexdigest(),
                      "ckpt_digest": ckpt_digest,
                      "acc1": stats["acc1"], "acc5": stats["acc5"],
                      "loss": stats["loss"]}), flush=True)


if __name__ == "__main__":
    main()
