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
