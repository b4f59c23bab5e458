"""RegNetY — inference-only CNN teacher for knowledge distillation.

The reference's default KD teacher is timm `regnety_160`
(reference search.py:158, finetune.py:120); the published OFB-DeiT recipe
hard-distills from this convnet. This is a TPU-native NHWC implementation:

  * grouped 3x3 convs via `feature_group_count` (XLA maps them onto the
    MXU directly);
  * BatchNorm is inference-only and pre-folded into per-channel
    (scale, bias) affines at import time — the forward is conv -> affine
    -> relu, which XLA fuses into the conv epilogue;
  * weights import from a timm-format torch state dict
    (`torch_regnet_to_params`), so any downloaded regnety_160 checkpoint
    drops in.

Architecture (pycls "RegNetY", Radosavovic et al. 2020): stem conv3x3/2,
four stages of pre-activationless bottleneck-Y blocks (1x1 -> grouped
3x3/stride -> SE(0.25 * block input) -> 1x1, residual + ReLU), global
average pool, linear head. regnety_160 = depths (2,4,11,1), widths
(224,448,1232,3024), group width 112, stem 32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict


@dataclass(frozen=True)
class RegNetCfg:
    depths: Tuple[int, ...]
    widths: Tuple[int, ...]
    group_width: int
    stem_width: int = 32
    se_ratio: float = 0.25
    num_classes: int = 1000
    bn_eps: float = 1e-5

    @property
    def num_stages(self) -> int:
        return len(self.depths)


REGNET_CFGS = {
    # pycls / timm model zoo parameterizations
    "regnety_040": RegNetCfg(depths=(2, 6, 12, 2),
                             widths=(128, 192, 512, 1088), group_width=64),
    "regnety_080": RegNetCfg(depths=(2, 4, 10, 1),
                             widths=(168, 448, 896, 2016), group_width=56),
    "regnety_160": RegNetCfg(depths=(2, 4, 11, 1),
                             widths=(224, 448, 1232, 3024), group_width=112),
    "regnety_320": RegNetCfg(depths=(2, 5, 12, 1),
                             widths=(232, 696, 1392, 3712),
                             group_width=232),
}


def _conv_init(key, kh, kw, cin, cout, groups=1):
    fan_in = kh * kw * cin // groups
    w = jax.random.normal(key, (kh, kw, cin // groups, cout)) \
        * np.sqrt(2.0 / fan_in)
    return {"kernel": w.astype(jnp.float32)}


def _affine_init(c):
    # folded inference BN: identity until real stats are imported
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def init_regnet_params(key, cfg: RegNetCfg) -> Params:
    keys = iter(jax.random.split(key, 512))
    p: Params = {
        "stem": {"conv": _conv_init(next(keys), 3, 3, 3, cfg.stem_width),
                 "bn": _affine_init(cfg.stem_width)},
        "stages": [],
        "head": {"kernel": jax.random.normal(
            next(keys), (cfg.widths[-1], cfg.num_classes)) * 0.01,
            "bias": jnp.zeros((cfg.num_classes,))},
    }
    w_in = cfg.stem_width
    for s in range(cfg.num_stages):
        w_out = cfg.widths[s]
        blocks = []
        for b in range(cfg.depths[s]):
            g = w_out // cfg.group_width
            se_c = max(1, int(round(cfg.se_ratio * w_in)))
            blk = {
                "conv1": _conv_init(next(keys), 1, 1, w_in, w_out),
                "bn1": _affine_init(w_out),
                "conv2": _conv_init(next(keys), 3, 3, w_out, w_out,
                                    groups=g),
                "bn2": _affine_init(w_out),
                "se_fc1": {"kernel": 0.01 * jax.random.normal(
                    next(keys), (w_out, se_c)), "bias": jnp.zeros((se_c,))},
                "se_fc2": {"kernel": 0.01 * jax.random.normal(
                    next(keys), (se_c, w_out)), "bias": jnp.zeros((w_out,))},
                "conv3": _conv_init(next(keys), 1, 1, w_out, w_out),
                "bn3": _affine_init(w_out),
            }
            if b == 0:
                blk["down_conv"] = _conv_init(next(keys), 1, 1, w_in, w_out)
                blk["down_bn"] = _affine_init(w_out)
            blocks.append(blk)
            w_in = w_out
        p["stages"].append(blocks)
    return p


def _conv(p, x, stride=1, groups=1):
    k = p["kernel"].astype(x.dtype)
    # explicit symmetric k//2 padding (torch/timm semantics — XLA's SAME
    # pads (0, 1) at stride 2, which shifts the window grid by one pixel)
    ph = k.shape[0] // 2
    pw = k.shape[1] // 2
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), ((ph, ph), (pw, pw)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(p, x):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _block(p, x, stride, groups):
    h = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], x)))
    h = jax.nn.relu(_bn(p["bn2"], _conv(p["conv2"], h, stride=stride,
                                        groups=groups)))
    # SE on the grouped-conv output, squeeze over H, W
    s = jnp.mean(h, axis=(1, 2))
    s = jax.nn.relu(s @ p["se_fc1"]["kernel"].astype(x.dtype)
                    + p["se_fc1"]["bias"].astype(x.dtype))
    s = jax.nn.sigmoid(s @ p["se_fc2"]["kernel"].astype(x.dtype)
                       + p["se_fc2"]["bias"].astype(x.dtype))
    h = h * s[:, None, None, :]
    h = _bn(p["bn3"], _conv(p["conv3"], h))
    if "down_conv" in p:
        x = _bn(p["down_bn"], _conv(p["down_conv"], x, stride=stride))
    return jax.nn.relu(x + h)


def regnet_forward(params: Params, x: jnp.ndarray, cfg: RegNetCfg, *,
                   compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, H, W, 3) NHWC -> (B, num_classes) fp32 logits. Inference only
    (the KD teacher is frozen; reference search.py:600-604 sets eval())."""
    x = x.astype(compute_dtype)
    h = jax.nn.relu(_bn(params["stem"]["bn"],
                        _conv(params["stem"]["conv"], x, stride=2)))
    for s, blocks in enumerate(params["stages"]):
        g = cfg.widths[s] // cfg.group_width
        for b, bp in enumerate(blocks):
            h = _block(bp, h, stride=2 if b == 0 else 1, groups=g)
    feat = jnp.mean(h, axis=(1, 2))
    logits = feat @ params["head"]["kernel"].astype(h.dtype) \
        + params["head"]["bias"].astype(h.dtype)
    return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# torch (timm-format) weight import
# ---------------------------------------------------------------------------

def _fold_bn(sd, prefix, eps):
    """torch BN -> folded inference affine (scale, bias)."""
    g = np.asarray(sd[prefix + ".weight"], np.float64)
    b = np.asarray(sd[prefix + ".bias"], np.float64)
    m = np.asarray(sd[prefix + ".running_mean"], np.float64)
    v = np.asarray(sd[prefix + ".running_var"], np.float64)
    scale = g / np.sqrt(v + eps)
    return {"scale": jnp.asarray(scale, jnp.float32),
            "bias": jnp.asarray(b - m * scale, jnp.float32)}


def _t_conv(sd, name):
    # torch OIHW -> HWIO
    w = np.asarray(sd[name + ".weight"])
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}


def _t_fc(sd, name):
    """1x1-conv or linear SE/fc weights -> (in, out) matmul form."""
    w = np.asarray(sd[name + ".weight"])
    if w.ndim == 4:                       # (out, in, 1, 1) conv form
        w = w[:, :, 0, 0]
    return {"kernel": jnp.asarray(w.T),
            "bias": jnp.asarray(np.asarray(sd[name + ".bias"]))}


def torch_regnet_to_params(sd: Dict, cfg: RegNetCfg) -> Params:
    """Import a timm RegNetY state dict (stem.conv/bn, s{1..4}.b{1..N}.
    conv1..3 + bn1..3 + se.fc1/fc2 + downsample.conv/bn, head.fc)."""
    sd = {k: v for k, v in sd.items()}
    eps = cfg.bn_eps
    p: Params = {
        "stem": {"conv": _t_conv(sd, "stem.conv"),
                 "bn": _fold_bn(sd, "stem.bn", eps)},
        "stages": [],
        "head": _t_fc(sd, "head.fc"),
    }
    for s in range(cfg.num_stages):
        blocks = []
        for b in range(cfg.depths[s]):
            pre = f"s{s + 1}.b{b + 1}"
            blk = {
                "conv1": _t_conv(sd, pre + ".conv1.conv"),
                "bn1": _fold_bn(sd, pre + ".conv1.bn", eps),
                "conv2": _t_conv(sd, pre + ".conv2.conv"),
                "bn2": _fold_bn(sd, pre + ".conv2.bn", eps),
                "se_fc1": _t_fc(sd, pre + ".se.fc1"),
                "se_fc2": _t_fc(sd, pre + ".se.fc2"),
                "conv3": _t_conv(sd, pre + ".conv3.conv"),
                "bn3": _fold_bn(sd, pre + ".conv3.bn", eps),
            }
            if pre + ".downsample.conv.weight" in sd:
                blk["down_conv"] = _t_conv(sd, pre + ".downsample.conv")
                blk["down_bn"] = _fold_bn(sd, pre + ".downsample.bn", eps)
            blocks.append(blk)
        p["stages"].append(blocks)
    return p
