"""Model registry: named factories like the reference's timm registrations.

Reference registers DeiT search/finetune factories in models/model.py
(deit_*_mim at :89-111,141-164; deit_*_finetune at :114-119,168-173;
distilled at :177-272) plus ~20 stock vit_* factories
(models/vision_transformer.py:1058-1310). Here `create_model(name, ...)`
returns a `ModelBundle` of static config + search space + init/apply
callables — the functional equivalent of an nn.Module instance.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable, Dict, Optional

import jax

from .mim_vit import init_alphas, init_mim_params, mim_forward
from .search_space import ArchState, SearchSpace
from .vit import ModelCfg, init_vit_params, vit_forward

_REGISTRY: Dict[str, Callable[..., "ModelBundle"]] = {}


@dataclass
class ModelBundle:
    name: str
    cfg: ModelCfg
    kind: str                       # 'mim' (searchable) | 'dense'
    space: Optional[SearchSpace] = None
    mae: bool = True

    def init(self, key, *, with_arch: bool = True):
        if self.kind == "mim":
            kp, ka = jax.random.split(key)
            params = init_mim_params(kp, self.cfg, self.space, mae=self.mae)
            if not with_arch:
                return params
            alphas = init_alphas(ka, self.space)
            arch = ArchState.create(self.space)
            return params, alphas, arch
        return init_vit_params(key, self.cfg)

    def apply(self, params, x, **kw):
        if self.kind == "mim":
            return mim_forward(params, kw.pop("alphas"), kw.pop("arch"), x,
                               self.cfg, self.space, **kw)
        return vit_forward(params, x, self.cfg, **kw)


def register_model(fn):
    _REGISTRY[fn.__name__] = fn
    return fn


def list_models():
    return sorted(_REGISTRY)


def create_model(name: str, **kwargs) -> ModelBundle:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; known: {list_models()}")
    return _REGISTRY[name](**kwargs)


# ---------------------------------------------------------------------------
# DeiT configurations (reference models/model.py)
# ---------------------------------------------------------------------------

_DEIT_DIMS = {
    "tiny": dict(embed_dim=192, num_heads=3),
    "small": dict(embed_dim=384, num_heads=6),
    "base": dict(embed_dim=768, num_heads=12),
}


def _deit_cfg(size: str, img_size=224, num_classes=1000, distilled=False,
              drop_rate=0.0, drop_path_rate=0.1) -> ModelCfg:
    d = _DEIT_DIMS[size]
    return ModelCfg(img_size=img_size, patch_size=16,
                    num_classes=num_classes, depth=12, mlp_ratio=4.0,
                    distilled=distilled, drop_rate=drop_rate,
                    drop_path_rate=drop_path_rate, **d)


def _mim_factory(size: str):
    def factory(num_classes=1000, img_size=224, mae=True, attn_search=True,
                mlp_search=True, embed_search=True, patch_search=True,
                head_search=False, channel_search=False, mask_ratio=1.0,
                drop_rate=0.0, drop_path_rate=0.1, distilled=False,
                **_unused) -> ModelBundle:
        cfg = _deit_cfg(size, img_size, num_classes, distilled, drop_rate,
                        drop_path_rate)
        space = SearchSpace.build(
            cfg.embed_dim, cfg.depth, cfg.num_heads, cfg.hidden,
            cfg.num_patches, attn_search=attn_search, mlp_search=mlp_search,
            embed_search=embed_search, patch_search=patch_search,
            head_search=head_search, channel_search=channel_search,
            mask_ratio=mask_ratio)
        return ModelBundle(name=f"deit_{size}_patch16_{img_size}_mim",
                           cfg=cfg, kind="mim", space=space, mae=mae)
    return factory


def _dense_factory(size: str, img_size=224, distilled=False):
    def factory(num_classes=1000, drop_rate=0.0, drop_path_rate=0.1,
                embed_dim=None, num_heads=None, head_dim=None,
                mlp_hidden=None, qk_scale=None, **_unused) -> ModelBundle:
        cfg = _deit_cfg(size, img_size, num_classes, distilled, drop_rate,
                        drop_path_rate)
        # exported (pruned) subnets override dims explicitly
        if embed_dim is not None:
            cfg = replace(cfg, embed_dim=embed_dim)
        if num_heads is not None:
            cfg = replace(cfg, num_heads=num_heads)
        if head_dim is not None:
            cfg = replace(cfg, head_dim=head_dim)
        if mlp_hidden is not None:
            cfg = replace(cfg, mlp_hidden=mlp_hidden)
        if qk_scale is not None:
            cfg = replace(cfg, qk_scale=qk_scale)
        return ModelBundle(name=f"deit_{size}_patch16_{img_size}", cfg=cfg,
                           kind="dense")
    return factory


# searchable MIM supernets (reference models/model.py:89-111, 141-164)
for _size in ("tiny", "small", "base"):
    _REGISTRY[f"deit_{_size}_patch16_224_mim"] = _mim_factory(_size)

# plain/finetune models (reference models/model.py:71-85, 114-119, 168-173,
# 231-254) + distilled (177-272)
for _size in ("tiny", "small", "base"):
    for _img in (224, 384):
        for _dist in (False, True):
            _suffix = "_distilled" if _dist else ""
            _name = f"deit_{_size}{_suffix}_patch16_{_img}"
            _REGISTRY[_name] = _dense_factory(_size, _img, _dist)
            _REGISTRY[f"deit_{_size}_patch16_{_img}_finetune"] = \
                _REGISTRY[f"deit_{_size}_patch16_{_img}"]

def add_search_params(bundle: ModelBundle, *, attn_search=True,
                      mlp_search=True, embed_search=True, patch_search=True,
                      head_search=False, channel_search=False,
                      mask_ratio=1.0) -> ModelBundle:
    """Turn a dense bundle into a searchable MIM bundle
    (reference models/model.py:274-283 `add_search_params`)."""
    cfg = bundle.cfg
    space = SearchSpace.build(
        cfg.embed_dim, cfg.depth, cfg.num_heads, cfg.hidden,
        cfg.num_patches, attn_search=attn_search, mlp_search=mlp_search,
        embed_search=embed_search, patch_search=patch_search,
        head_search=head_search, channel_search=channel_search,
        mask_ratio=mask_ratio)
    return ModelBundle(name=bundle.name + "_mim", cfg=cfg, kind="mim",
                       space=space)


# stock ViT variants (reference models/vision_transformer.py:1058-1310)
_VIT_DIMS = {
    "vit_small": dict(embed_dim=768, depth=8, num_heads=8, mlp_ratio=3.0),
    "vit_base": dict(embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0),
    "vit_large": dict(embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4.0),
}
# vit_huge uses patch 14 (reference vision_transformer.py:1248-1260);
# the resnet-hybrid factories (vit_*_resnet*) are deliberately absent —
# they need a torchvision ResNet backbone the TPU port does not carry.
_VIT_DIMS["vit_huge"] = dict(embed_dim=1280, depth=32, num_heads=16,
                             mlp_ratio=4.0)
for _vname, _dims in _VIT_DIMS.items():
    for _patch in ((14,) if _vname == "vit_huge" else (16, 32)):
        for _img in (224, 384):
            def _vf(num_classes=1000, drop_rate=0.0, drop_path_rate=0.0,
                    _dims=_dims, _patch=_patch, _img=_img,
                    **_unused) -> ModelBundle:
                cfg = ModelCfg(img_size=_img, patch_size=_patch,
                               num_classes=num_classes,
                               drop_rate=drop_rate,
                               drop_path_rate=drop_path_rate, **_dims)
                return ModelBundle(name="vit", cfg=cfg, kind="dense")
            _REGISTRY[f"{_vname}_patch{_patch}_{_img}"] = _vf


# in21k pretraining variants (reference vision_transformer.py:1154-1208):
# 21843-class head + a tanh pre-logits representation layer.
for _vname, _dims in _VIT_DIMS.items():
    if _vname == "vit_small":      # reference registers no small_in21k
        continue
    for _patch in ((14,) if _vname == "vit_huge" else (16, 32)):
        def _vf21k(num_classes=21843, drop_rate=0.0, drop_path_rate=0.0,
                   _dims=_dims, _patch=_patch, **_unused) -> ModelBundle:
            cfg = ModelCfg(img_size=224, patch_size=_patch,
                           num_classes=num_classes, drop_rate=drop_rate,
                           drop_path_rate=drop_path_rate,
                           representation_size=_dims["embed_dim"], **_dims)
            return ModelBundle(name="vit", cfg=cfg, kind="dense")
        _REGISTRY[f"{_vname}_patch{_patch}_224_in21k"] = _vf21k

# MIIL variants (reference vision_transformer.py:1293-1310): qkv_bias=False
for _miil_name, _miil_nc in (("vit_base_patch16_224_miil_in21k", 11221),
                             ("vit_base_patch16_224_miil", 1000)):
    def _vfm(num_classes=_miil_nc, drop_rate=0.0, drop_path_rate=0.0,
             **_unused) -> ModelBundle:
        cfg = ModelCfg(img_size=224, patch_size=16, num_classes=num_classes,
                       embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0,
                       qkv_bias=False, drop_rate=drop_rate,
                       drop_path_rate=drop_path_rate)
        return ModelBundle(name="vit", cfg=cfg, kind="dense")
    _REGISTRY[_miil_name] = _vfm

# vit_deit_* aliases (reference vision_transformer.py:1210-1292 registers the
# DeiT family under both names)
for _size in ("tiny", "small", "base"):
    for _img, _dist in ((224, False), (224, True), (384, False), (384, True)):
        if _img == 384 and _size != "base":
            continue
        _suffix = "_distilled" if _dist else ""
        _REGISTRY[f"vit_deit_{_size}{_suffix}_patch16_{_img}"] = \
            _REGISTRY[f"deit_{_size}{_suffix}_patch16_{_img}"]


# Swin family (dense; the reference README lists unreleased OFB-Swin
# results, README.md:27-31 — searchable Swin is future work)
from .swin import SwinCfg, init_swin_params, swin_forward  # noqa: E402


@dataclass
class SwinBundle:
    name: str
    cfg: SwinCfg
    kind: str = "swin"

    def init(self, key, **_):
        return init_swin_params(key, self.cfg)

    def apply(self, params, x, **kw):
        return swin_forward(params, x, self.cfg, **kw)


_SWIN_DIMS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2),
                 num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2),
                  num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2),
                 num_heads=(4, 8, 16, 32)),
}
for _sname, _sd in _SWIN_DIMS.items():
    def _sf(num_classes=1000, img_size=224, drop_path_rate=0.1,
            _sd=_sd, **_unused):
        cfg = SwinCfg(img_size=img_size, num_classes=num_classes,
                      drop_path_rate=drop_path_rate, **_sd)
        return SwinBundle(name="swin", cfg=cfg)
    _REGISTRY[f"swin_{_sname}_patch4_window7_224"] = _sf


from .swin_search import (build_swin_space, init_swin_search,  # noqa: E402
                          swin_search_forward)


@dataclass
class SwinSearchBundle:
    name: str
    cfg: SwinCfg
    space: "SearchSpace"
    kind: str = "swin_mim"

    def init(self, key, **_):
        return init_swin_search(key, self.cfg, self.space)

    def apply(self, params, x, **kw):
        return swin_search_forward(params, kw.pop("alphas"),
                                   kw.pop("arch"), x, self.cfg, self.space,
                                   **kw)


for _sname, _sd in _SWIN_DIMS.items():
    def _ssf(num_classes=1000, img_size=224, attn_search=True,
             mlp_search=True, head_search=False, channel_search=False,
             embed_search=False, drop_path_rate=0.1, _sd=_sd, **_unused):
        cfg = SwinCfg(img_size=img_size, num_classes=num_classes,
                      drop_path_rate=drop_path_rate, **_sd)
        space = build_swin_space(cfg, attn_search=attn_search,
                                 mlp_search=mlp_search,
                                 head_search=head_search,
                                 channel_search=channel_search,
                                 embed_search=embed_search)
        return SwinSearchBundle(name="swin_mim", cfg=cfg, space=space)
    _REGISTRY[f"swin_{_sname}_patch4_window7_224_mim"] = _ssf
