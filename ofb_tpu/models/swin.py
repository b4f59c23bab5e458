"""Dense Swin Transformer — functional JAX, NHWC, static shapes.

The reference README lists (unreleased) OFB-Swin-A/B/C results
(reference README.md:27-31) but ships no Swin code; this module seeds the
family TPU-natively so a later round can add the searchable variant:
window attention with relative position bias, cyclic-shift windows with a
precomputed static attention mask, and patch merging between stages.

Layout: windows are partitioned with pure reshapes/transposes (no gathers);
the shift is jnp.roll (fast lane/sublane moves); the shifted-window mask is
a numpy constant per stage.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.gates import layer_norm
from .vit import Params, dropout, drop_path, linear, trunc_normal

NEG_INF = -1e9


def _swin_pack() -> int:
    """Window-pack factor for _window_attention (OFB_SWIN_PACK).

    Default 2 — MEASURED on v5e (BENCH.md round 3): dense Swin-T
    698 -> 818 img/s, search Swin-T 693 -> 823, search Swin-S 332 -> 506.
    Pack=4 loses (2x2 tile spill). OFB_SWIN_PACK=1 opts out. Read at trace
    time so tests/benches can flip it per-jit; attention falls back to
    unpacked automatically when Bw or the mask group count doesn't divide.
    """
    import os
    return int(os.environ.get("OFB_SWIN_PACK", "2"))


@dataclass(frozen=True)
class SwinCfg:
    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ln_eps: float = 1e-5

    @property
    def num_stages(self) -> int:
        return len(self.depths)

    def stage_dim(self, s: int) -> int:
        return self.embed_dim * (2 ** s)

    def stage_res(self, s: int) -> int:
        return self.img_size // self.patch_size // (2 ** s)

    def drop_path_schedule(self):
        total = sum(self.depths)
        return np.linspace(0, self.drop_path_rate, total).tolist()


# ---------------------------------------------------------------------------
# window helpers (pure reshape/transpose)
# ---------------------------------------------------------------------------

def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, w*w, C)"""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def window_reverse(x: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, w*w, C) -> (B, H, W, C)"""
    C = x.shape[-1]
    B = x.shape[0] // ((H // w) * (W // w))
    x = x.reshape(B, H // w, W // w, w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def shifted_window_mask(res: int, w: int, shift: int) -> np.ndarray:
    """Attention mask for cyclic-shifted windows: (nW, w*w, w*w) with
    NEG_INF at cross-region pairs. Pure numpy (it is a static constant and
    must stay trace-free so callers can build it inside jit)."""
    img = np.zeros((res, res), np.int32)
    cnt = 0
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(res // w, w, res // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)                          # (nW, w*w)
    mask = (win[:, None, :] != win[:, :, None])
    return np.where(mask, NEG_INF, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _linear_init(key, d_in, d_out):
    return {"kernel": trunc_normal(key, (d_in, d_out)),
            "bias": jnp.zeros((d_out,))}


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_swin_params(key, cfg: SwinCfg) -> Params:
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    D = cfg.embed_dim
    p = cfg.patch_size
    params: Params = {
        "patch_embed": {
            "proj": {"kernel": trunc_normal(keys[next(ki)],
                                            (p, p, cfg.in_chans, D)),
                     "bias": jnp.zeros((D,))},
            "norm": _ln_init(D),
        },
        "stages": [],
        "norm": _ln_init(cfg.stage_dim(cfg.num_stages - 1)),
        "head": _linear_init(keys[next(ki)],
                             cfg.stage_dim(cfg.num_stages - 1),
                             cfg.num_classes),
    }
    for s in range(cfg.num_stages):
        dim = cfg.stage_dim(s)
        heads = cfg.num_heads[s]
        blocks = []
        for b in range(cfg.depths[s]):
            k1, k2, k3, k4, k5 = jax.random.split(keys[next(ki)], 5)
            blocks.append({
                "norm1": _ln_init(dim),
                "attn": {
                    "qkv": _linear_init(k1, dim, dim * 3),
                    "proj": _linear_init(k2, dim, dim),
                    "rel_bias": trunc_normal(
                        k3, ((2 * cfg.window - 1) ** 2, heads)),
                },
                "norm2": _ln_init(dim),
                "mlp": {
                    "fc1": _linear_init(k4, dim, int(dim * cfg.mlp_ratio)),
                    "fc2": _linear_init(k5, int(dim * cfg.mlp_ratio), dim),
                },
            })
        stage: Dict[str, Any] = {"blocks": blocks}
        if s < cfg.num_stages - 1:
            stage["downsample"] = {
                "norm": _ln_init(4 * dim),
                "reduction": {"kernel": trunc_normal(keys[next(ki)],
                                                     (4 * dim, 2 * dim))},
            }
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _block_diag_pack(m: jnp.ndarray, g: int, fill: float) -> jnp.ndarray:
    """(..., K, N, N) groups of K consecutive blocks -> (..., K/g, g*N, g*N)
    block-diagonal, off-diagonal blocks = fill. Static construction."""
    *lead, K, N, _ = m.shape
    grouped = m.reshape(*lead, K // g, g, N, N)
    out = jnp.full((*lead, K // g, g * N, g * N), fill, m.dtype)
    for i in range(g):
        out = out.at[..., i * N:(i + 1) * N, i * N:(i + 1) * N].set(
            grouped[..., i, :, :])
    return out


def _window_attention(p: Params, x: jnp.ndarray, heads: int, w: int,
                      rel_idx: jnp.ndarray,
                      mask: Optional[jnp.ndarray],
                      pack: int = 1) -> jnp.ndarray:
    """x: (B*nW, w*w, C). Softmax in fp32 with relative position bias and
    the optional shifted-window mask.

    pack=G fuses G consecutive windows into one attention of N'=G*w*w with
    a block-diagonal mask (off-blocks -1e9): identical math, but the tiny
    N=49 matmuls fill the 128-wide MXU tiles better (A/B in BENCH.md;
    opt-in via OFB_SWIN_PACK)."""
    Bw, N, _ = x.shape
    packed = (pack > 1 and Bw % pack == 0
              and (mask is None or mask.shape[0] % pack == 0))
    if packed:
        x = x.reshape(Bw // pack, pack * N, x.shape[-1])
    qkv = linear(p["qkv"], x)
    # widths are shape-driven: an embed-sliced export keeps the dense qkv
    # inner width while the residual C shrinks, so derive hd from the qkv
    # output, not from C
    Cq = qkv.shape[-1] // 3
    hd = Cq // heads
    Bp, Np = x.shape[0], x.shape[1]
    qkv = qkv.reshape(Bp, Np, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
    attn = attn * (hd ** -0.5)
    bias = jnp.take(p["rel_bias"].astype(jnp.float32), rel_idx.reshape(-1),
                    axis=0).reshape(N, N, heads).transpose(2, 0, 1)
    if packed:
        # bias on diagonal blocks; off-blocks killed so packed windows
        # cannot attend each other
        bias = _block_diag_pack(jnp.broadcast_to(bias[:, None],
                                                 (heads, pack, N, N)),
                                pack, 0.0)[:, 0]        # (heads, pN, pN)
        attn = attn + bias[None]
        attn = attn + jnp.asarray(
            np.kron(1.0 - np.eye(pack, dtype=np.float32),
                    np.ones((N, N), np.float32)) * NEG_INF)[None, None]
        if mask is not None:
            nW = mask.shape[0]
            mp = _block_diag_pack(mask, pack, 0.0)      # (nW/pack, pN, pN)
            attn = attn.reshape(Bp // (nW // pack), nW // pack, heads,
                                Np, Np) + mp[None, :, None]
            attn = attn.reshape(Bp, heads, Np, Np)
    else:
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, heads, N, N) + \
                mask[None, :, None]
            attn = attn.reshape(Bw, heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bp, Np, Cq)
    y = linear(p["proj"], y)
    if packed:
        y = y.reshape(Bw, N, y.shape[-1])
    return y


def swin_forward(params: Params, x: jnp.ndarray, cfg: SwinCfg, *,
                 train: bool = False, rng=None,
                 compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, H, W, 3) NHWC -> (B, num_classes) fp32 logits."""
    x = x.astype(compute_dtype)
    B = x.shape[0]
    kern = params["patch_embed"]["proj"]["kernel"].astype(x.dtype)
    p = cfg.patch_size
    h = jax.lax.conv_general_dilated(
        x, kern, (p, p), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = h + params["patch_embed"]["proj"]["bias"].astype(x.dtype)
    h = layer_norm(h, params["patch_embed"]["norm"]["scale"],
                   params["patch_embed"]["norm"]["bias"], eps=cfg.ln_eps)

    w = cfg.window
    rel_idx = jnp.asarray(relative_position_index(w))
    dps = cfg.drop_path_schedule()
    dp_i = 0
    rngs = iter(jax.random.split(rng, sum(cfg.depths) * 2)
                if rng is not None else [None] * (sum(cfg.depths) * 2))

    for s, stage in enumerate(params["stages"]):
        res = cfg.stage_res(s)
        heads = cfg.num_heads[s]
        shift_mask = jnp.asarray(shifted_window_mask(res, w, w // 2)) \
            if res > w else None
        for b, bp in enumerate(stage["blocks"]):
            shift = (w // 2) if (b % 2 == 1 and res > w) else 0
            B_, H_, W_, C_ = h.shape
            sc = layer_norm(h.reshape(B_, -1, C_), bp["norm1"]["scale"],
                            bp["norm1"]["bias"],
                            eps=cfg.ln_eps).reshape(B_, H_, W_, C_)
            if shift:
                sc = jnp.roll(sc, (-shift, -shift), axis=(1, 2))
            win = window_partition(sc, w)
            att = _window_attention(bp["attn"], win, heads, w, rel_idx,
                                    shift_mask if shift else None,
                                    pack=_swin_pack())
            att = window_reverse(att, w, H_, W_)
            if shift:
                att = jnp.roll(att, (shift, shift), axis=(1, 2))
            h = h + drop_path(att, dps[dp_i], next(rngs), train)
            mlp_in = layer_norm(h.reshape(B_, -1, C_), bp["norm2"]["scale"],
                                bp["norm2"]["bias"], eps=cfg.ln_eps)
            y = jax.nn.gelu(linear(bp["mlp"]["fc1"], mlp_in),
                            approximate=False)
            y = linear(bp["mlp"]["fc2"], y).reshape(B_, H_, W_, C_)
            h = h + drop_path(y, dps[dp_i], next(rngs), train)
            dp_i += 1

        if "downsample" in stage:
            # patch merging: 2x2 neighborhood concat -> norm -> linear
            B_, H_, W_, C_ = h.shape
            h = h.reshape(B_, H_ // 2, 2, W_ // 2, 2, C_)
            h = h.transpose(0, 1, 3, 4, 2, 5).reshape(
                B_, H_ // 2, W_ // 2, 4 * C_)
            # swin concat order: (0,0), (1,0), (0,1), (1,1)
            h = layer_norm(h, stage["downsample"]["norm"]["scale"],
                           stage["downsample"]["norm"]["bias"],
                           eps=cfg.ln_eps)
            h = h @ stage["downsample"]["reduction"]["kernel"].astype(h.dtype)

    B_, H_, W_, C_ = h.shape
    h = layer_norm(h.reshape(B_, -1, C_), params["norm"]["scale"],
                   params["norm"]["bias"], eps=cfg.ln_eps)
    feat = jnp.mean(h, axis=1)                       # global average pool
    return linear(params["head"], feat).astype(jnp.float32)
