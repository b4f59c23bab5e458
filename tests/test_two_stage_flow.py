"""Two-stage run_exp flow through the real CLI (reference run_exp.sh /
search.py:773-787): stage-1 search breaks at the fuse point and must save
model_fused == fuse(best checkpoint) with a post-fuse eval recorded;
stage-2 resumes from running_ckpt for the remaining epochs."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_search(argv, timeout=900):
    code = (f"import sys; sys.argv = {['search.py'] + argv!r}; "
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy; "
            "runpy.run_path('scripts/search.py', run_name='__main__')")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def test_two_stage_search_fuse_resume(tmp_path):
    import jax

    from ofb_tpu.core import checkpoint as ckpt
    from ofb_tpu.models.mim_vit import fuse_params
    from ofb_tpu.models.registry import ModelBundle
    from ofb_tpu.models.search_space import ArchState, SearchSpace
    from ofb_tpu.models.vit import ModelCfg

    out = str(tmp_path / "exp")
    base = ["--data-set", "SYNTHETIC", "--tiny-test", "--batch-size", "64",
            "--accum-iter", "1", "--compute-dtype", "float32",
            "--output_dir", out, "--compress-thresh", "1.5",
            "--num_workers", "0", "--seed", "3"]

    # stage 1: converge fast (thresh kills all but the top cell on the
    # first compress), break at the fuse point, fuse from best
    r1 = _run_search(base + ["--epochs", "3", "--fuse_point", "1"])
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert "breaking at fuse_point 1" in r1.stdout
    assert "saved model_fused" in r1.stdout
    fmeta = json.load(open(os.path.join(out, "model_fused", "meta.json")))
    assert fmeta["fused"] is True and fmeta["best_epoch"] >= 0
    assert fmeta["fused_acc1"] is not None   # fused net was evaluated

    # the fused artifact must equal fuse(best checkpoint), not
    # fuse(final-epoch state)
    cfg = ModelCfg(img_size=32, patch_size=8, num_classes=1000,
                   embed_dim=32, depth=2, num_heads=2, mlp_ratio=2.0,
                   drop_path_rate=0.1)
    space = SearchSpace.build(32, 2, 2, cfg.hidden, cfg.num_patches,
                              patch_search=True)
    bundle = ModelBundle(name="tiny", cfg=cfg, kind="mim", space=space)
    params, alphas, arch = bundle.init(jax.random.PRNGKey(0))
    best = ckpt.load_checkpoint(os.path.join(out, "best"), params=params,
                                alphas=alphas, arch=arch)
    expect, _ = fuse_params(best["params"], best["arch"], space, cfg)
    fused = ckpt.load_checkpoint(os.path.join(out, "model_fused"),
                                 params=params)
    flat_e = jax.tree_util.tree_leaves(expect)
    flat_g = jax.tree_util.tree_leaves(fused["params"])
    assert len(flat_e) == len(flat_g)
    for e, g in zip(flat_e, flat_g):
        np.testing.assert_allclose(np.asarray(e), np.asarray(g), atol=1e-6)

    # stage 2: resume from running_ckpt for the remaining epoch
    r2 = _run_search(base + ["--epochs", "3", "--fuse_point", "3",
                             "--resume", "--checkpoint",
                             os.path.join(out, "running_ckpt")])
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "resumed from" in r2.stdout
    assert "Epoch [2]" in r2.stdout        # continued at the right epoch


def test_finetune_from_scratch_dense_init():
    """--finetune '' trains the plain registry model from a fresh init
    (the ladder's dense comparator row — scripts/ladder_imnet.sh writes
    it to <root>/dense_ft). The cfg must be the registry geometry and
    the params a real init, not a restored checkpoint."""
    import argparse

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.finetune import load_searched_model

    args = argparse.Namespace(model="deit_tiny_patch16_224_finetune",
                              tiny_test=False, seed=0)
    params, cfg = load_searched_model("", args, nb_classes=17)
    assert cfg.embed_dim == 192 and cfg.depth == 12
    assert cfg.num_classes == 17
    assert params["head"]["kernel"].shape == (192, 17)
    # tiny-test geometry honored too
    args2 = argparse.Namespace(model="ignored", tiny_test=True, seed=0)
    p2, c2 = load_searched_model("", args2, nb_classes=5)
    assert c2.embed_dim == 32 and c2.depth == 2
    assert p2["head"]["kernel"].shape == (32, 5)
    # deterministic in the seed
    p3, _ = load_searched_model("", args, nb_classes=17)
    assert float(jax.numpy.abs(
        p3["head"]["kernel"] - params["head"]["kernel"]).max()) == 0.0
