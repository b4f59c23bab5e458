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
