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


# ---------------------------------------------------------------------------
# Search-mode gate-math parity against the ACTUAL reference implementation
# (/root/reference/models/layers.py imported as-is, with a minimal timm
# stub since timm is not installed). Drives the reference's MAEPatchEmbed /
# MAESparseMlp / MAESparseAttention and our bimask_gate_1d / bimask_gate_attn
# with identical alpha/score/switch/w_p states and asserts matching outputs
# (reference models/layers.py:173-200, 488-537, 843-865).
# ---------------------------------------------------------------------------

def _ref_layers():
    """Import the reference layers module standalone (timm stubbed)."""
    import importlib.util
    import sys
    import types

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        th = types.ModuleType("timm.models.layers.helpers")
        th.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        tl.trunc_normal_ = torch.nn.init.trunc_normal_
        tl.helpers = th
        tm.layers = tl
        timm.models = tm
        sys.modules.update({"timm": timm, "timm.models": tm,
                            "timm.models.layers": tl,
                            "timm.models.layers.helpers": th})
    spec = importlib.util.spec_from_file_location(
        "ref_layers", "/root/reference/models/layers.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


W_P = 0.7


def test_patch_embed_gate_parity_vs_reference():
    """Search-mode patch-embed forward: weighted-mask softmax + double-
    argsort rank restore + w_p entanglement, incl. inactive switch cells.
    The reference output is permuted (reserved-then-dropped concat,
    layers.py:192-195); we compare through that documented permutation."""
    from ofb_tpu.ops.gates import bimask_gate_1d

    ref = _ref_layers()
    torch.manual_seed(3)
    D = 32
    pm = ref.PatchEmbed(32, 8, 3, D, None)
    m = ref.MAEPatchEmbed(pm, embed_search=True)
    m.eval()
    K = m.alpha.shape[1]
    # controlled states: some inactive cells (but keep the full-size cell
    # active so no channel is hard-dead, matching the pre-slice invariant)
    alpha = torch.randn(1, K)
    switch = torch.ones(1, K, dtype=torch.bool)
    switch[0, 1] = False
    switch[0, K // 2] = False
    score = torch.randn(1, D) * 0.5
    m.alpha.data = alpha.clone()
    m.switch_cell = switch.clone()
    m.score.data = score.clone()
    m.w_p = W_P

    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref_out = m(x).numpy()                       # (B, N, D) permuted
        toks = m.proj(x).flatten(2).transpose(1, 2).numpy()
        ref_restore = m.get_weight()[0].numpy()[0]   # (D,) channel order

    gate, restore = bimask_gate_1d(
        jnp.asarray(score.numpy()[0]), jnp.asarray(alpha.numpy()[0]),
        jnp.asarray(switch.numpy()[0]), jnp.asarray(np.asarray(m.mask)),
        jnp.ones(D), jnp.asarray(W_P), jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(restore), ref_restore, atol=1e-6)

    ours = toks * np.asarray(gate)[None, None, :]
    # reference concat order: [channels with restore>0 (original order),
    # channels with restore<=0 (zeroed)]
    pos = np.where(ref_restore > 0)[0]
    nonpos = np.where(ref_restore <= 0)[0]
    perm = np.concatenate([pos, nonpos])
    np.testing.assert_allclose(ours[..., perm], ref_out, atol=1e-5)


def test_mlp_gate_parity_vs_reference():
    """Search-mode MLP forward (gate applied in place, no permutation):
    full output parity fc1 -> gate -> GELU -> fc2."""
    from ofb_tpu.ops.gates import bimask_gate_1d

    ref = _ref_layers()
    torch.manual_seed(4)
    D, HID = 32, 64
    base = ref.Mlp(D, HID, D)
    m = ref.MAESparseMlp(base, mlp_search=True)
    m.eval()
    K = m.alpha.shape[1]
    alpha = torch.randn(1, K)
    switch = torch.ones(1, K, dtype=torch.bool)
    switch[0, 2] = False
    score = torch.randn(1, HID) * 0.5
    m.alpha.data = alpha.clone()
    m.switch_cell = switch.clone()
    m.score.data = score.clone()
    m.w_p = W_P

    x = torch.randn(2, 17, D)
    with torch.no_grad():
        ref_out = m(x).numpy()
        w1 = m.fc1.weight.numpy()
        b1 = m.fc1.bias.numpy()
        w2 = m.fc2.weight.numpy()
        b2 = m.fc2.bias.numpy()

    gate, _ = bimask_gate_1d(
        jnp.asarray(score.numpy()[0]), jnp.asarray(alpha.numpy()[0]),
        jnp.asarray(switch.numpy()[0]), jnp.asarray(np.asarray(m.mask)),
        jnp.ones(HID), jnp.asarray(W_P), jnp.asarray(False))
    h = jnp.asarray(x.numpy()) @ w1.T + b1
    h = h * gate[None, None, :]
    h = jax.nn.gelu(h, approximate=False)
    ours = np.asarray(h @ w2.T + b2)
    np.testing.assert_allclose(ours, ref_out, atol=1e-5)


def test_attn_gate_parity_vs_reference():
    """Search-mode attention forward: joint head x channel weighted mask,
    per-head channel rank restore + head rank restore by saliency mass,
    w_p-entangled q/k/v gates (layers.py:488-521). Full output parity."""
    from ofb_tpu.ops.gates import bimask_gate_attn

    ref = _ref_layers()
    torch.manual_seed(5)
    D, H = 32, 4
    d = D // H
    base = ref.Attention(D, num_heads=H, qkv_bias=True)
    m = ref.MAESparseAttention(base, head_search=False, channel_search=False,
                               attn_search=True)
    m.eval()
    Kh, Kc = m.alpha.shape
    alpha = torch.randn(Kh, Kc)
    switch = torch.ones(Kh, Kc, dtype=torch.bool)
    switch[0, 1] = False
    switch[1, 3] = False
    score = torch.randn(H, d) * 0.5
    m.alpha.data = alpha.clone()
    m.switch_cell = switch.clone()
    m.score.data = score.clone()
    m.w_p = W_P

    x = torch.randn(2, 17, D)
    with torch.no_grad():
        ref_out = m(x).numpy()
        wqkv = m.qkv.weight.numpy()
        bqkv = m.qkv.bias.numpy()
        wproj = m.proj.weight.numpy()
        bproj = m.proj.bias.numpy()

    gate, _ = bimask_gate_attn(
        jnp.asarray(score.numpy()), jnp.asarray(alpha.numpy()),
        jnp.asarray(switch.numpy()), jnp.asarray(np.asarray(m.mask)),
        jnp.ones((H, d)), jnp.asarray(W_P), jnp.asarray(False))

    B, N = 2, 17
    qkv = jnp.asarray(x.numpy()) @ wqkv.T + bqkv          # (B, N, 3D)
    qkv = qkv.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                      # (B, H, N, d)
    g = np.asarray(gate)[None, :, None, :]
    q, k, v = q * g, k * g, v * g
    attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) * m.scale, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
    ours = np.asarray(out @ wproj.T + bproj)
    np.testing.assert_allclose(ours, ref_out, atol=1e-5)


def test_masked_ln_parity_vs_reference_split_cat():
    """Our in-place masked-moment LN vs the reference's split-normalize-
    concat with sliced affine params (vision_transformer.py:193-200 after a
    physical slice): identical values up to the documented permutation."""
    from ofb_tpu.ops.gates import masked_layer_norm

    torch.manual_seed(6)
    D = 32
    alive = np.ones(D, np.float32)
    dead = np.array([3, 7, 20, 31])
    alive[dead] = 0.0
    n_res = int(alive.sum())
    w = torch.randn(D).abs() + 0.5
    b = torch.randn(D) * 0.1
    x = torch.randn(2, 9, D)

    pos = np.where(alive > 0)[0]
    nonpos = np.where(alive <= 0)[0]
    with torch.no_grad():
        x_res = x[..., torch.tensor(pos)]
        x_drop = x[..., torch.tensor(nonpos)]
        ref_ln = torch.nn.functional.layer_norm(
            x_res, (n_res,), w[torch.tensor(pos)], b[torch.tensor(pos)],
            1e-6)
        ref_out = torch.cat([ref_ln, x_drop], dim=-1).numpy()

    ours = np.asarray(masked_layer_norm(
        jnp.asarray(x.numpy()), jnp.asarray(alive), jnp.asarray(w.numpy()),
        jnp.asarray(b.numpy()), passthrough="identity"))
    perm = np.concatenate([pos, nonpos])
    np.testing.assert_allclose(ours[..., perm], ref_out, atol=1e-5)
