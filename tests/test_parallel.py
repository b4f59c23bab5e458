"""Parallelism tests on the 8-device CPU platform: dp and dp x tp sharded
search steps must match the single-device step numerically (XLA inserts
the collectives; replicated state stays bitwise identical — SURVEY §2.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofb_tpu.config import SearchConfig
from ofb_tpu.core.optim import build_search_optimizer
from ofb_tpu.core.steps import TrainState, make_search_step
from ofb_tpu.models.registry import ModelBundle
from ofb_tpu.models.search_space import SearchSpace
from ofb_tpu.models.vit import ModelCfg
from ofb_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                   param_sharding_rules, replicate)

CFG = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
               depth=2, num_heads=2, mlp_ratio=2.0)


def setup_state():
    space = SearchSpace.build(32, 2, 2, CFG.hidden, CFG.num_patches,
                              patch_search=True)
    bundle = ModelBundle(name="tiny", cfg=CFG, kind="mim", space=space)
    scfg = SearchConfig(accum_iter=1, target_flops=0.0002).resolve(1)
    tx, _ = build_search_optimizer(
        scfg.optim_param, scfg.optim_arch, scfg.optim_decoder, scfg.schedule,
        total_steps=100, steps_per_epoch=10)
    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                       alphas=alphas, arch=arch,
                       opt_state=tx.init((params, alphas)))
    step = make_search_step(space, CFG, scfg, tx, phase="search",
                            compute_dtype=jnp.float32, donate=False)
    return bundle, state, step


@pytest.mark.parametrize("tp", [1, 2, 4])
def test_sharded_step_matches_single_device(tp):
    assert len(jax.devices()) >= 8
    bundle, state, step = setup_state()
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 32, 32, 3))
    lbls = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 10)
    rng = jax.random.PRNGKey(3)
    keep = jnp.asarray(0.8)

    ref_state, ref_metrics = step(state, imgs, lbls, rng, keep)

    mesh = make_mesh((8 // tp, tp))
    p_sh = param_sharding_rules(mesh, state.params, tensor_parallel=tp > 1)
    sharded = state.replace(
        params=jax.tree_util.tree_map(jax.device_put, state.params, p_sh),
        alphas=replicate(mesh, state.alphas),
        arch=replicate(mesh, state.arch),
        opt_state=replicate(mesh, state.opt_state))
    s_imgs = jax.device_put(imgs, batch_sharding(mesh, leading_accum=True))
    s_lbls = jax.device_put(lbls, batch_sharding(mesh, leading_accum=True))

    out_state, metrics = step(sharded, s_imgs, s_lbls, rng, keep)

    np.testing.assert_allclose(float(metrics["loss_total"]),
                               float(ref_metrics["loss_total"]),
                               rtol=2e-4)
    # spot-check updated weights agree
    a = np.asarray(out_state.params["blocks"][0]["attn"]["qkv"]["kernel"])
    b = np.asarray(ref_state.params["blocks"][0]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(a, b, atol=2e-5)
    a = np.asarray(out_state.alphas["embed"])
    b = np.asarray(ref_state.alphas["embed"])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_dryrun_multichip_driver_path():
    """The driver calls dryrun_multichip() directly in a process whose
    backend may already be a 1-device TPU — the function must succeed by
    re-exec'ing itself (round-1 red gate, MULTICHIP_r01.json rc=1).
    Simulated here with a 1-device CPU backend in a subprocess."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        f"import sys; sys.path.insert(0, {repo!r}); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    assert "OK" in res.stdout


def test_distributed_helpers_single_host():
    """parallel/distributed.py coverage: init_distributed is a no-op
    single-host (rank 0 of 1), reinit_mesh rebuilds a mesh over the
    current device set and re-replicates state, barrier_sync is a no-op
    for world=1 (the 2-process path is exercised in test_multiprocess)."""
    from ofb_tpu.parallel.distributed import (barrier_sync,
                                              init_distributed,
                                              reinit_mesh)
    rank, world = init_distributed()          # no coordinator configured
    assert (rank, world) == (0, 1)

    tree = {"w": jnp.arange(8.0), "b": {"x": jnp.ones((2, 2))}}
    mesh, placed = reinit_mesh(tree)
    assert mesh.devices.size == len(jax.devices())
    np.testing.assert_array_equal(np.asarray(placed["w"]),
                                  np.arange(8.0))
    # replicated: every device holds the full value
    assert placed["w"].sharding.is_fully_replicated

    mesh2, placed2 = reinit_mesh(placed, shape=(4, 2))
    assert mesh2.devices.shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(placed2["b"]["x"]),
                                  np.ones((2, 2)))

    barrier_sync("test")                      # world=1: returns immediately
