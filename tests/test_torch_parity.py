"""Numerical parity: our dense ViT forward vs a torch implementation of the
same architecture, through the torch-state-dict import path
(ofb_tpu/models/torch_import.py). Validates every weight-layout convention
(conv HWIO, linear transpose, LN naming) end to end — the M1 exit test of
SURVEY §7.2 without needing the FB checkpoint download."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from ofb_tpu.models.torch_import import (params_to_torch_state_dict,
                                         torch_state_dict_to_params)
from ofb_tpu.models.vit import ModelCfg, init_vit_params, vit_forward


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, N, 3, self.heads,
                                  C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.proj(h)
        h = self.norm2(x)
        x = x + self.fc2(F.gelu(self.fc1(h)))
        return x


class TorchViT(nn.Module):
    def __init__(self, img=32, patch=8, dim=32, depth=2, heads=2,
                 hidden=64, classes=10):
        super().__init__()
        self.conv = nn.Conv2d(3, dim, patch, patch)
        n = (img // patch) ** 2
        self.cls = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TorchBlock(dim, heads, hidden) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, classes)

    def forward(self, x):
        B = x.shape[0]
        t = self.conv(x).flatten(2).transpose(1, 2)
        t = torch.cat([self.cls.expand(B, -1, -1), t], 1) + self.pos
        for b in self.blocks:
            t = b(t)
        t = self.norm(t)
        return self.head(t[:, 0])

    def state_dict_vit_names(self):
        sd = {}
        sd["patch_embed.proj.weight"] = self.conv.weight.detach()
        sd["patch_embed.proj.bias"] = self.conv.bias.detach()
        sd["cls_token"] = self.cls.detach()
        sd["pos_embed"] = self.pos.detach()
        for i, b in enumerate(self.blocks):
            sd[f"blocks.{i}.norm1.weight"] = b.norm1.weight.detach()
            sd[f"blocks.{i}.norm1.bias"] = b.norm1.bias.detach()
            sd[f"blocks.{i}.attn.qkv.weight"] = b.qkv.weight.detach()
            sd[f"blocks.{i}.attn.qkv.bias"] = b.qkv.bias.detach()
            sd[f"blocks.{i}.attn.proj.weight"] = b.proj.weight.detach()
            sd[f"blocks.{i}.attn.proj.bias"] = b.proj.bias.detach()
            sd[f"blocks.{i}.norm2.weight"] = b.norm2.weight.detach()
            sd[f"blocks.{i}.norm2.bias"] = b.norm2.bias.detach()
            sd[f"blocks.{i}.mlp.fc1.weight"] = b.fc1.weight.detach()
            sd[f"blocks.{i}.mlp.fc1.bias"] = b.fc1.bias.detach()
            sd[f"blocks.{i}.mlp.fc2.weight"] = b.fc2.weight.detach()
            sd[f"blocks.{i}.mlp.fc2.bias"] = b.fc2.bias.detach()
        sd["norm.weight"] = self.norm.weight.detach()
        sd["norm.bias"] = self.norm.bias.detach()
        sd["head.weight"] = self.head.weight.detach()
        sd["head.bias"] = self.head.bias.detach()
        return sd


CFG = ModelCfg(img_size=32, patch_size=8, num_classes=10, embed_dim=32,
               depth=2, num_heads=2, mlp_hidden=64, drop_path_rate=0.0)


def test_forward_parity_with_torch():
    torch.manual_seed(0)
    tmodel = TorchViT()
    tmodel.eval()
    sd = tmodel.state_dict_vit_names()

    params = init_vit_params(jax.random.PRNGKey(0), CFG)
    params = torch_state_dict_to_params(sd, CFG, params)

    rs = np.random.RandomState(0)
    x = rs.rand(4, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(vit_forward(params, jnp.asarray(x), CFG,
                                  compute_dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_state_dict_roundtrip():
    params = init_vit_params(jax.random.PRNGKey(1), CFG)
    sd = params_to_torch_state_dict(params)
    params2 = torch_state_dict_to_params(sd, CFG,
                                         init_vit_params(
                                             jax.random.PRNGKey(2), CFG))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# RegNetY teacher parity (reference search.py:158: timm regnety_160 is the
# default KD teacher). A torch RegNetY with timm state-dict naming, random
# weights AND random BN running stats, imported through
# torch_regnet_to_params — validates conv layout, grouped conv, SE, BN
# folding, and the downsample path.
# ---------------------------------------------------------------------------

class _TConvBn(nn.Module):
    def __init__(self, cin, cout, k, s, groups=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, s, padding=k // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class _TYBlock(nn.Module):
    def __init__(self, w_in, w_out, stride, gw, se_ratio=0.25):
        super().__init__()
        g = w_out // gw
        self.conv1 = _TConvBn(w_in, w_out, 1, 1)
        self.conv2 = _TConvBn(w_out, w_out, 3, stride, groups=g)
        self.se = nn.Module()
        se_c = max(1, int(round(se_ratio * w_in)))
        self.se.fc1 = nn.Conv2d(w_out, se_c, 1)
        self.se.fc2 = nn.Conv2d(se_c, w_out, 1)
        self.conv3 = _TConvBn(w_out, w_out, 1, 1)
        if stride != 1 or w_in != w_out:
            self.downsample = _TConvBn(w_in, w_out, 1, stride)

    def forward(self, x):
        h = F.relu(self.conv1(x))
        h = F.relu(self.conv2(h))
        s = h.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.se.fc2(F.relu(self.se.fc1(s))))
        h = self.conv3(h * s)
        sc = self.downsample(x) if hasattr(self, "downsample") else x
        return F.relu(sc + h)


class _TRegNetY(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.stem = _TConvBn(3, cfg.stem_width, 3, 2)
        w_in = cfg.stem_width
        for s in range(cfg.num_stages):
            stage = nn.Module()
            for b in range(cfg.depths[s]):
                setattr(stage, f"b{b + 1}",
                        _TYBlock(w_in, cfg.widths[s], 2 if b == 0 else 1,
                                 cfg.group_width, cfg.se_ratio))
                w_in = cfg.widths[s]
            setattr(self, f"s{s + 1}", stage)
        self.head = nn.Module()
        self.head.fc = nn.Linear(cfg.widths[-1], cfg.num_classes)
        self.cfg = cfg

    def forward(self, x):
        h = F.relu(self.stem(x))
        for s in range(self.cfg.num_stages):
            stage = getattr(self, f"s{s + 1}")
            for b in range(self.cfg.depths[s]):
                h = getattr(stage, f"b{b + 1}")(h)
        return self.head.fc(h.mean((2, 3)))


def test_regnet_teacher_parity():
    from ofb_tpu.models.regnet import (RegNetCfg, regnet_forward,
                                       torch_regnet_to_params)
    cfg = RegNetCfg(depths=(1, 2), widths=(16, 32), group_width=8,
                    stem_width=8, num_classes=10)
    tnet = _TRegNetY(cfg)
    # non-trivial BN running stats so the folding path is really tested
    g = torch.Generator().manual_seed(0)
    for m in tnet.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.5
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5
            m.weight.data = torch.rand(m.num_features, generator=g) + 0.5
            m.bias.data = torch.randn(m.num_features, generator=g) * 0.1
    tnet.eval()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    params = torch_regnet_to_params(sd, cfg)

    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(regnet_forward(params, jnp.asarray(x), cfg,
                                    compute_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_regnety_160_shapes():
    """The full teacher builds and runs at its published parameterization
    (224x448x1232x3024, group 112 -> 2/4/11/27 groups per stage)."""
    from ofb_tpu.models.regnet import (REGNET_CFGS, init_regnet_params,
                                       regnet_forward)
    import dataclasses
    cfg = dataclasses.replace(REGNET_CFGS["regnety_160"], num_classes=7)
    params = init_regnet_params(jax.random.PRNGKey(0), cfg)
    k2 = params["stages"][2][0]["conv2"]["kernel"]
    assert k2.shape == (3, 3, 1232 // 11, 1232)     # grouped conv slices cin
    x = jnp.zeros((1, 64, 64, 3))                   # small spatial is fine
    out = regnet_forward(params, x, cfg, compute_dtype=jnp.float32)
    assert out.shape == (1, 7)
