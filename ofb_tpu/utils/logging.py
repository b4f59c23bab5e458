"""Run logging: JSONL log.txt / alpha.txt writers + process-0 print.

Reference search.py:744-770 (log.txt per-epoch train/test stats with live
param count and searched GFLOPs; alpha.txt JSON-lines of every alpha) and
utils.py:177-218 (master-only print / save_on_master).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np
import jax


def is_main_process() -> bool:
    return jax.process_index() == 0


def master_print(*args, **kwargs):
    if is_main_process():
        print(*args, **kwargs)


class RunLogger:
    def __init__(self, output_dir: str):
        self.dir = output_dir
        if is_main_process() and output_dir:
            os.makedirs(output_dir, exist_ok=True)

    def append_jsonl(self, filename: str, record: Dict[str, Any]):
        if not (is_main_process() and self.dir):
            return
        with open(os.path.join(self.dir, filename), "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_epoch(self, epoch: int, train_stats: Dict[str, float],
                  test_stats: Dict[str, float], n_parameters: int,
                  n_gflops: float):
        self.append_jsonl("log.txt", {
            **{f"train_{k}": v for k, v in train_stats.items()},
            **{f"soft_test_{k}": v for k, v in test_stats.items()},
            "epoch": epoch,
            "n_parameters": int(n_parameters),
            "n_gflops": float(n_gflops),
        })

    def log_alphas(self, epoch: int, alphas) -> None:
        """alpha.txt JSON-lines (reference search.py:753-770), grouped by
        dimension family like `give_alphas` (reference base_model.py:13-26)."""
        rec = {
            "epoch": epoch,
            "attn": [np.asarray(b["attn"]).reshape(-1).tolist()
                     for b in alphas["blocks"]],
            "mlp": [np.asarray(b["mlp"]).reshape(-1).tolist()
                    for b in alphas["blocks"]],
            "patch": np.asarray(alphas["patch"]).reshape(-1).tolist(),
            "embed": [np.asarray(alphas["embed"]).reshape(-1).tolist()],
        }
        self.append_jsonl("alpha.txt", rec)

    def save_score_maps(self, params, alphas, arch, space) -> None:
        """saliency/sparsity/joint .npy dumps (reference search.py:686-710):
        per searchable module — saliency = sorted sigmoid(score), sparsity =
        the sorted-domain weighted mask, joint = (1-w_p)*mask + w_p*saliency.
        Appended across epochs with dedup of unchanged snapshots."""
        if not (is_main_process() and self.dir):
            return
        import jax.numpy as jnp
        from ..ops.gates import weighted_mask_1d, weighted_mask_attn

        maps = {}
        for name in ("saliency", "sparsity", "joint"):
            p = os.path.join(self.dir, name + ".npy")
            maps[name] = (np.load(p, allow_pickle=True).item()
                          if os.path.exists(p) else {})

        def add(idx, score, wm, w_p):
            s = 1.0 / (1.0 + np.exp(-np.asarray(score, np.float64)))
            s_sorted = np.sort(s, axis=-1)[..., ::-1]
            if s_sorted.ndim == 2 and s_sorted.shape[0] > 1:
                order = np.argsort(s_sorted.sum(-1))[::-1]
                s_sorted = s_sorted[order]
            m = np.asarray(wm, np.float64)
            for name, val in (("saliency", s_sorted), ("sparsity", m),
                              ("joint", (1 - w_p) * m + w_p * s_sorted)):
                hist = maps[name].setdefault(idx, [])
                if hist and hist[-1].shape == val.shape and \
                        np.array_equal(hist[-1], val):
                    continue
                hist.append(val)

        idx = 0
        add(idx, params["patch_embed"]["score"],
            weighted_mask_1d(alphas["embed"], arch.embed.switch,
                             jnp.asarray(space.embed.mask_bank)),
            float(arch.embed.w_p))
        for i, bs in enumerate(space.blocks):
            idx += 1
            add(idx, params["blocks"][i]["attn"]["score"],
                weighted_mask_attn(alphas["blocks"][i]["attn"],
                                   arch.blocks[i].attn.switch,
                                   jnp.asarray(bs.attn.mask_bank)),
                float(arch.blocks[i].attn.w_p))
            idx += 1
            add(idx, params["blocks"][i]["mlp"]["score"],
                weighted_mask_1d(alphas["blocks"][i]["mlp"],
                                 arch.blocks[i].mlp.switch,
                                 jnp.asarray(bs.mlp.mask_bank)),
                float(arch.blocks[i].mlp.w_p))

        for name, d in maps.items():
            np.save(os.path.join(self.dir, name + ".npy"), d)  # type: ignore
