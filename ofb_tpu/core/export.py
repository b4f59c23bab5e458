"""Export: materialize the searched subnet as a physically-small dense model.

The one place where tensor shapes actually change. Equivalent of the
reference's `intersect` loader (reference finetune.py:182-249: copy pruned
weights into a fresh plain ViT, reset in/out features, interpolate the
pos-embed) — but run *forward* from the static-gate supernet:

  1. fuse saliency scores into the weights if not already fused
     (reference search.py:775-787 -> models/vision_transformer.py:747-757);
  2. slice every tensor by the hard masks (embed channels, per-block
     head x channel sets, MLP hidden units);
  3. emit a dense param pytree + a ModelCfg with per-block dims.

Because the supernet keeps hard-dead dimensions at exactly zero (see
models/mim_vit.py), the sliced model is numerically identical to the gated
supernet's eval forward — verified in tests/test_export.py.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.mim_vit import fuse_params
from ..models.search_space import ArchState, SearchSpace
from ..models.vit import ModelCfg, Params


def _idx(mask: np.ndarray) -> np.ndarray:
    return np.where(np.asarray(mask) > 0)[0]


def export_subnet(params: Params, arch: ArchState, space: SearchSpace,
                  cfg: ModelCfg, *, fuse: bool = True
                  ) -> Tuple[Params, ModelCfg, Dict[str, Any]]:
    """Slice the (finished) supernet into a compact dense model.

    Returns (dense_params, dense_cfg, meta). meta records the keep sets so
    a checkpoint can be re-expanded or audited.
    """
    if fuse and not bool(arch.fused):
        params, arch = fuse_params(params, arch, space, cfg)

    e_keep = _idx(arch.embed.hard_mask)
    D = len(e_keep)

    out: Params = {
        "patch_embed": {
            "proj": {
                "kernel": jnp.asarray(
                    np.asarray(params["patch_embed"]["proj"]["kernel"])
                    [..., e_keep]),
                "bias": jnp.asarray(
                    np.asarray(params["patch_embed"]["proj"]["bias"])
                    [e_keep]),
            }
        },
        "cls_token": jnp.asarray(
            np.asarray(params["cls_token"])[..., e_keep]),
        "pos_embed": jnp.asarray(
            np.asarray(params["pos_embed"])[..., e_keep]),
        "norm": {
            "scale": jnp.asarray(np.asarray(params["norm"]["scale"])[e_keep]),
            "bias": jnp.asarray(np.asarray(params["norm"]["bias"])[e_keep]),
        },
        "head": {
            "kernel": jnp.asarray(
                np.asarray(params["head"]["kernel"])[e_keep, :]),
            "bias": jnp.asarray(np.asarray(params["head"]["bias"])),
        },
        "blocks": [],
    }
    if "dist_token" in params:
        out["dist_token"] = jnp.asarray(
            np.asarray(params["dist_token"])[..., e_keep])
        out["head_dist"] = {
            "kernel": jnp.asarray(
                np.asarray(params["head_dist"]["kernel"])[e_keep, :]),
            "bias": jnp.asarray(np.asarray(params["head_dist"]["bias"])),
        }

    block_dims = []
    meta_blocks = []
    for i, bp in enumerate(params["blocks"]):
        ba = arch.blocks[i]
        hard = np.asarray(ba.attn.hard_mask)          # (H, d)
        H_full, hd_full = hard.shape
        head_keep = _idx(hard.sum(axis=1))
        Hp = len(head_keep)
        # per kept head, kept channel ids (every kept head keeps the same
        # count by construction of the grid)
        chan_per_head = [_idx(hard[h]) for h in head_keep]
        dp = len(chan_per_head[0]) if Hp else 0
        assert all(len(c) == dp for c in chan_per_head), \
            "heterogeneous per-head channel counts"

        # qkv output index: q/k/v segments, within each: head h's channels
        seg = []
        for h, chans in zip(head_keep, chan_per_head):
            seg.append(h * hd_full + chans)
        seg = np.concatenate(seg) if Hp else np.zeros((0,), np.int64)
        qkv_rows = np.concatenate([k * H_full * hd_full + seg
                                   for k in range(3)])

        m_keep = _idx(ba.mlp.hard_mask)
        hidp = len(m_keep)

        qkv = bp["attn"]["qkv"]
        proj = bp["attn"]["proj"]
        fc1, fc2 = bp["mlp"]["fc1"], bp["mlp"]["fc2"]
        nb = {
            "norm1": {
                "scale": jnp.asarray(
                    np.asarray(bp["norm1"]["scale"])[e_keep]),
                "bias": jnp.asarray(np.asarray(bp["norm1"]["bias"])[e_keep]),
            },
            "attn": {
                "qkv": {
                    "kernel": jnp.asarray(
                        np.asarray(qkv["kernel"])[np.ix_(e_keep, qkv_rows)]),
                    "bias": jnp.asarray(
                        np.asarray(qkv["bias"])[qkv_rows]),
                },
                "proj": {
                    "kernel": jnp.asarray(
                        np.asarray(proj["kernel"])[np.ix_(seg, e_keep)]),
                    "bias": jnp.asarray(
                        np.asarray(proj["bias"])[e_keep]),
                },
            },
            "norm2": {
                "scale": jnp.asarray(
                    np.asarray(bp["norm2"]["scale"])[e_keep]),
                "bias": jnp.asarray(np.asarray(bp["norm2"]["bias"])[e_keep]),
            },
            "mlp": {
                "fc1": {
                    "kernel": jnp.asarray(
                        np.asarray(fc1["kernel"])[np.ix_(e_keep, m_keep)]),
                    "bias": jnp.asarray(np.asarray(fc1["bias"])[m_keep]),
                },
                "fc2": {
                    "kernel": jnp.asarray(
                        np.asarray(fc2["kernel"])[np.ix_(m_keep, e_keep)]),
                    "bias": jnp.asarray(np.asarray(fc2["bias"])[e_keep]),
                },
            },
        }
        out["blocks"].append(nb)
        block_dims.append((Hp, dp, hidp))
        meta_blocks.append({
            "head_keep": head_keep.tolist(),
            "chan_keep": [c.tolist() for c in chan_per_head],
            "mlp_keep": m_keep.tolist(),
        })

    dense_cfg = replace(
        cfg, embed_dim=D, block_overrides=tuple(block_dims),
        num_heads=block_dims[0][0] if block_dims else cfg.num_heads,
        head_dim=block_dims[0][1] if block_dims else cfg.hd,
        mlp_hidden=block_dims[0][2] if block_dims else cfg.hidden)

    meta = {
        "embed_keep": e_keep.tolist(),
        "blocks": meta_blocks,
        "embed_dim": D,
        "block_dims": block_dims,
    }
    return out, dense_cfg, meta


def exported_param_count(params: Params) -> int:
    import jax
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
