"""Run logging artifacts: log.txt / alpha.txt JSONL, score-map dumps
(reference search.py:686-770 artifact set)."""

import json
import os

import numpy as np
import jax
import pytest

from ofb_tpu.models.mim_vit import init_alphas, init_mim_params
from ofb_tpu.models.search_space import ArchState, SearchSpace
from ofb_tpu.models.vit import ModelCfg
from ofb_tpu.utils.logging import RunLogger
from ofb_tpu.utils.metrics import MetricLogger, SmoothedValue

CFG = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
               depth=1, num_heads=2, mlp_ratio=2.0)


def setup(tmp_path):
    space = SearchSpace.build(32, 1, 2, CFG.hidden, CFG.num_patches,
                              patch_search=True)
    params = init_mim_params(jax.random.PRNGKey(0), CFG, space)
    alphas = init_alphas(jax.random.PRNGKey(1), space)
    arch = ArchState.create(space)
    return RunLogger(str(tmp_path)), space, params, alphas, arch


def test_log_epoch_and_alphas(tmp_path):
    logger, space, params, alphas, arch = setup(tmp_path)
    logger.log_epoch(3, {"loss_total": 1.5}, {"acc1": 42.0},
                     n_parameters=123456, n_gflops=0.9)
    logger.log_alphas(3, alphas)

    rec = json.loads(open(tmp_path / "log.txt").readline())
    assert rec["epoch"] == 3 and rec["train_loss_total"] == 1.5
    assert rec["soft_test_acc1"] == 42.0 and rec["n_parameters"] == 123456

    arec = json.loads(open(tmp_path / "alpha.txt").readline())
    assert arec["epoch"] == 3
    assert len(arec["attn"]) == 1 and len(arec["mlp"]) == 1
    assert len(arec["patch"]) == space.patch.num_cells


def test_score_maps_roundtrip_and_dedup(tmp_path):
    logger, space, params, alphas, arch = setup(tmp_path)
    logger.save_score_maps(params, alphas, arch, space)
    logger.save_score_maps(params, alphas, arch, space)  # unchanged -> dedup
    for name in ("saliency", "sparsity", "joint"):
        d = np.load(tmp_path / f"{name}.npy", allow_pickle=True).item()
        # embed + (attn, mlp) per block
        assert len(d) == 1 + 2 * len(space.blocks)
        for hist in d.values():
            assert len(hist) == 1    # second save deduplicated


def test_metric_logger_log_every():
    lines = []
    ml = MetricLogger(print_fn=lines.append)
    for x in ml.log_every(range(25), print_freq=10, header="T"):
        ml.update(loss=float(x))
    assert any("[0/25]" in ln for ln in lines)
    assert any("Total time" in ln for ln in lines)
    assert abs(ml.meters["loss"].global_avg - 12.0) < 1e-6


def test_smoothed_value_window():
    sv = SmoothedValue(window_size=3)
    for v in (1, 2, 3, 4):
        sv.update(v)
    assert sv.value == 4 and sv.median == 3
    assert sv.global_avg == 2.5
