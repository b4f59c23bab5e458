"""KD teacher construction shared by the search and finetune CLIs.

The reference instantiates its teacher through timm
(reference search.py:587-604, finetune.py:425-440: create_model +
checkpoint load + eval()). Here a teacher is just a frozen apply
closure: RegNetY names resolve to the TPU-native convnet
(models/regnet.py, the reference's default regnety_160 recipe), anything
else to the ViT/DeiT registry; weights import from torch state dicts.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax

from ..parallel.mesh import replicate
from .regnet import (REGNET_CFGS, init_regnet_params, regnet_forward,
                     torch_regnet_to_params)


def build_teacher(name: str, *, teacher_path: str = "", num_classes: int,
                  mesh, compute_dtype) -> Callable:
    """Returns teacher_apply(images) -> fp32 logits (frozen weights)."""
    import os

    if teacher_path and os.path.isdir(teacher_path):
        # A native ofb_tpu checkpoint directory (e.g. a dense comparator or
        # exported+finetuned rung): the "synthetic-trained teacher" path —
        # the reference loads its timm teacher from a torch checkpoint
        # (search.py:587-604); here the analogous strong teacher on this
        # machine's data IS a prior finetune run.
        import jax.numpy as jnp

        from ..core import checkpoint as ckpt
        from .vit import ModelCfg, init_vit_params, vit_forward

        meta = ckpt.latest_meta(teacher_path)
        if meta is None:
            raise SystemExit(f"teacher_path {teacher_path}: no checkpoint "
                             "meta.json found")
        if meta.get("family") == "swin":
            raise SystemExit("swin teacher checkpoints are not supported "
                             "as KD teachers yet (vit/regnet only)")
        tcfg = ckpt.model_cfg_from_meta(meta["model_cfg"], ModelCfg)
        tpl = init_vit_params(jax.random.PRNGKey(7), tcfg)
        restored = ckpt.load_checkpoint(teacher_path, params=tpl)
        tparams = replicate(mesh, jax.tree_util.tree_map(
            jnp.asarray, restored["params"]))

        def teacher_apply(images, _tp=tparams, _tc=tcfg):
            return vit_forward(_tp, images, _tc, train=False,
                               compute_dtype=compute_dtype)

        return teacher_apply

    sd = None
    if teacher_path:
        import torch
        sd = torch.load(teacher_path, map_location="cpu")
        sd = sd.get("model", sd)
        sd = {k: v.detach().numpy() if hasattr(v, "detach") else v
              for k, v in sd.items()}

    if name in REGNET_CFGS:
        rcfg = dataclasses.replace(REGNET_CFGS[name],
                                   num_classes=num_classes)
        if sd is not None:
            tparams = torch_regnet_to_params(sd, rcfg)
        else:
            tparams = init_regnet_params(jax.random.PRNGKey(7), rcfg)
        tparams = replicate(mesh, tparams)

        def teacher_apply(images, _p=tparams, _c=rcfg):
            return regnet_forward(_p, images, _c,
                                  compute_dtype=compute_dtype)

        return teacher_apply

    from .registry import create_model
    from .torch_import import torch_state_dict_to_params
    try:
        tbundle = create_model(name, num_classes=num_classes)
    except KeyError as e:
        raise SystemExit(
            f"teacher model '{name}' is neither a RegNetY "
            f"({'/'.join(REGNET_CFGS)}) nor a registry ViT/DeiT") from e
    tparams = tbundle.init(jax.random.PRNGKey(7))
    if sd is not None:
        tparams = torch_state_dict_to_params(sd, tbundle.cfg, tparams)
    tparams = replicate(mesh, tparams)

    def teacher_apply(images, _tb=tbundle, _tp=tparams):
        return _tb.apply(_tp, images, train=False,
                         compute_dtype=compute_dtype)

    return teacher_apply
