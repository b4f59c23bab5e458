"""Import PyTorch DeiT/ViT checkpoints into ofb_tpu parameter pytrees.

The reference loads FB DeiT weights with shape-mismatch pops
(reference models/model.py:97-110) and a checkpoint filter that resizes
pos-embeds (models/vision_transformer.py:988-1023). This module maps a torch
state_dict (names like `blocks.0.attn.qkv.weight`) to our NHWC/row-major
pytree:

  torch Linear weight (out, in)      -> kernel (in, out)  [transpose]
  torch Conv2d weight (out, in, kh, kw) -> kernel (kh, kw, in, out)
  LayerNorm weight/bias              -> scale/bias
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp

from .pos_embed import interpolate_pos_embed
from .vit import ModelCfg, Params


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def torch_state_dict_to_params(sd: Dict[str, Any], cfg: ModelCfg,
                               params: Params, *, strict: bool = False
                               ) -> Params:
    """Overlay a torch state_dict onto an initialized param pytree.

    Shape-mismatched head / pos_embed entries are skipped like the reference
    (models/model.py:105-110). `sd` values may be torch tensors or numpy.
    """
    sd = {k: _t(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    out = jnpify(params)

    def have(k):
        return k in sd

    def linear(dst, prefix):
        if have(prefix + ".weight"):
            dst["kernel"] = jnp.asarray(sd[prefix + ".weight"].T)
        if have(prefix + ".bias"):
            dst["bias"] = jnp.asarray(sd[prefix + ".bias"])

    def ln(dst, prefix):
        if have(prefix + ".weight"):
            dst["scale"] = jnp.asarray(sd[prefix + ".weight"])
            dst["bias"] = jnp.asarray(sd[prefix + ".bias"])

    # patch embed conv
    if have("patch_embed.proj.weight"):
        w = sd["patch_embed.proj.weight"]           # (D, C, kh, kw)
        out["patch_embed"]["proj"]["kernel"] = jnp.asarray(
            w.transpose(2, 3, 1, 0))
        out["patch_embed"]["proj"]["bias"] = jnp.asarray(
            sd["patch_embed.proj.bias"])

    for name in ("cls_token", "dist_token", "mask_token"):
        if have(name) and name in out:
            out[name] = jnp.asarray(sd[name])

    if have("pos_embed"):
        pe = jnp.asarray(sd["pos_embed"])
        want = out["pos_embed"].shape
        if pe.shape != want:
            if pe.shape[-1] == want[-1]:
                pe = interpolate_pos_embed(pe, want[1] - cfg.num_tokens,
                                           cfg.num_tokens)
            else:
                pe = None  # embed width mismatch: keep init (reference pops)
        if pe is not None and pe.shape == want:
            out["pos_embed"] = pe

    depth = len(out["blocks"])
    for i in range(depth):
        b = out["blocks"][i]
        ln(b["norm1"], f"blocks.{i}.norm1")
        ln(b["norm2"], f"blocks.{i}.norm2")
        linear(b["attn"]["qkv"], f"blocks.{i}.attn.qkv")
        linear(b["attn"]["proj"], f"blocks.{i}.attn.proj")
        linear(b["mlp"]["fc1"], f"blocks.{i}.mlp.fc1")
        linear(b["mlp"]["fc2"], f"blocks.{i}.mlp.fc2")

    ln(out["norm"], "norm")

    # heads: skip on class-count mismatch (reference models/model.py:105-107)
    for head, pfx in (("head", "head"), ("head_dist", "head_dist")):
        if head in out and have(pfx + ".weight"):
            if sd[pfx + ".weight"].shape[0] == out[head]["kernel"].shape[1]:
                linear(out[head], pfx)

    if strict:
        consumed = _consumed_keys(depth)
        missing = [k for k in sd if k not in consumed
                   and not k.startswith("pre_logits")]
        if missing:
            raise KeyError(f"unconsumed checkpoint keys: {missing[:10]}")
    return out


def _consumed_keys(depth):
    keys = {"patch_embed.proj.weight", "patch_embed.proj.bias", "cls_token",
            "dist_token", "mask_token", "pos_embed", "norm.weight",
            "norm.bias", "head.weight", "head.bias", "head_dist.weight",
            "head_dist.bias"}
    for i in range(depth):
        for mod in (f"blocks.{i}.norm1", f"blocks.{i}.norm2",
                    f"blocks.{i}.attn.qkv", f"blocks.{i}.attn.proj",
                    f"blocks.{i}.mlp.fc1", f"blocks.{i}.mlp.fc2"):
            keys.add(mod + ".weight")
            keys.add(mod + ".bias")
    return keys


def jnpify(tree):
    """Deep-copy a pytree into mutable python containers with jnp leaves."""
    if isinstance(tree, dict):
        return {k: jnpify(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [jnpify(v) for v in tree]
    return tree


def params_to_torch_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Export our pytree as a torch-layout state_dict (for users migrating
    back, and for parity tests against torch implementations)."""
    sd: Dict[str, np.ndarray] = {}

    def linear(src, prefix):
        sd[prefix + ".weight"] = np.asarray(src["kernel"]).T
        if "bias" in src:
            sd[prefix + ".bias"] = np.asarray(src["bias"])

    def ln(src, prefix):
        sd[prefix + ".weight"] = np.asarray(src["scale"])
        sd[prefix + ".bias"] = np.asarray(src["bias"])

    pe = params["patch_embed"]["proj"]
    sd["patch_embed.proj.weight"] = np.asarray(pe["kernel"]).transpose(
        3, 2, 0, 1)
    sd["patch_embed.proj.bias"] = np.asarray(pe["bias"])
    for name in ("cls_token", "dist_token", "mask_token", "pos_embed"):
        if name in params:
            sd[name] = np.asarray(params[name])
    for i, b in enumerate(params["blocks"]):
        ln(b["norm1"], f"blocks.{i}.norm1")
        ln(b["norm2"], f"blocks.{i}.norm2")
        linear(b["attn"]["qkv"], f"blocks.{i}.attn.qkv")
        linear(b["attn"]["proj"], f"blocks.{i}.attn.proj")
        linear(b["mlp"]["fc1"], f"blocks.{i}.mlp.fc1")
        linear(b["mlp"]["fc2"], f"blocks.{i}.mlp.fc2")
    ln(params["norm"], "norm")
    for head in ("head", "head_dist"):
        if head in params and params[head]:
            linear(params[head], head)
    return sd
