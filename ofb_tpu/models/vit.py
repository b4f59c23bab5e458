"""Dense Vision Transformer — functional JAX implementation.

Equivalent capability to the reference's `VisionTransformer`
(reference models/vision_transformer.py:222-377) and
`DistilledVisionTransformer` (reference models/model.py:23-67), built
TPU-first: pure functions over parameter pytrees, NHWC layout, bf16 compute
with fp32 parameters/statistics, static shapes throughout.

Used directly for the finetune stage (after export of the searched subnet)
and as the structural base of the searchable MIM model (mim_vit.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gates import layer_norm

Params = Dict[str, Any]


@dataclass(frozen=True)
class ModelCfg:
    """Static model hyper-parameters (hashable -> usable as a jit static arg).

    `head_dim` and `mlp_hidden` may be set explicitly for exported (pruned)
    subnets whose dimensions are no longer embed_dim/num_heads multiples
    (the reference reuses `num_heads` with whatever qkv width survives,
    finetune.py:182-249)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    head_dim: Optional[int] = None        # default embed_dim // num_heads
    mlp_hidden: Optional[int] = None      # default int(embed_dim * mlp_ratio)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    distilled: bool = False
    representation_size: Optional[int] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    ln_eps: float = 1e-6
    remat: bool = False     # jax.checkpoint each block (memory for FLOPs;
                            # lets DeiT-B search run at large batch)
    # Exported OFB subnets prune each block independently, so head count /
    # head width / MLP hidden may differ per block (the reference mutates
    # per-module shapes in `intersect`, finetune.py:182-249). Tuple of
    # (num_heads, head_dim, mlp_hidden) per block; None = uniform.
    block_overrides: Optional[Tuple[Tuple[int, int, int], ...]] = None

    def block_dims(self, i: int) -> Tuple[int, int, int]:
        if self.block_overrides is not None:
            return self.block_overrides[i]
        return (self.num_heads, self.hd, self.hidden)

    @property
    def hd(self) -> int:
        return self.head_dim if self.head_dim is not None else (
            self.embed_dim // self.num_heads)

    @property
    def hidden(self) -> int:
        return self.mlp_hidden if self.mlp_hidden is not None else int(
            self.embed_dim * self.mlp_ratio)

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def num_tokens(self) -> int:
        return 2 if self.distilled else 1

    @property
    def scale(self) -> float:
        return self.qk_scale if self.qk_scale is not None else self.hd ** -0.5

    def drop_path_schedule(self) -> Tuple[float, ...]:
        """Stochastic-depth decay rule (reference vision_transformer.py:273)."""
        return tuple(np.linspace(0, self.drop_path_rate, self.depth).tolist())


# ---------------------------------------------------------------------------
# Initialization helpers (trunc-normal .02 / zeros, matching DeiT init,
# reference vision_transformer.py:953-985)
# ---------------------------------------------------------------------------

def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _linear_init(key, d_in, d_out, bias=True):
    kw, _ = jax.random.split(key)
    p = {"kernel": trunc_normal(kw, (d_in, d_out))}
    if bias:
        p["bias"] = jnp.zeros((d_out,))
    return p


def _ln_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def init_block(key, cfg: ModelCfg) -> Params:
    kq, kp, k1, k2 = jax.random.split(key, 4)
    D, H, hd, hid = cfg.embed_dim, cfg.num_heads, cfg.hd, cfg.hidden
    return {
        "norm1": _ln_init(D),
        "attn": {
            "qkv": _linear_init(kq, D, 3 * H * hd, bias=cfg.qkv_bias),
            "proj": _linear_init(kp, H * hd, D),
        },
        "norm2": _ln_init(D),
        "mlp": {
            "fc1": _linear_init(k1, D, hid),
            "fc2": _linear_init(k2, hid, D),
        },
    }


def init_vit_params(key, cfg: ModelCfg) -> Params:
    keys = jax.random.split(key, cfg.depth + 6)
    D = cfg.embed_dim
    # patch-embed conv initialized like nn.Linear over the flattened patch
    # (reference vision_transformer.py:517-519 xavier_uniform)
    fan_in = cfg.patch_size * cfg.patch_size * cfg.in_chans
    limit = math.sqrt(6.0 / (fan_in + D))
    proj_kernel = jax.random.uniform(
        keys[0], (cfg.patch_size, cfg.patch_size, cfg.in_chans, D),
        minval=-limit, maxval=limit)
    params: Params = {
        "patch_embed": {"proj": {"kernel": proj_kernel, "bias": jnp.zeros((D,))}},
        "cls_token": trunc_normal(keys[1], (1, 1, D)),
        "pos_embed": trunc_normal(keys[2],
                                  (1, cfg.num_patches + cfg.num_tokens, D)),
        "blocks": [init_block(keys[6 + i], cfg) for i in range(cfg.depth)],
        "norm": _ln_init(D),
        "head": _linear_init(keys[3], D, cfg.num_classes)
        if cfg.num_classes > 0 else {},
    }
    if cfg.distilled:
        params["dist_token"] = trunc_normal(keys[4], (1, 1, D))
        params["head_dist"] = _linear_init(keys[5], D, cfg.num_classes)
    if cfg.representation_size and not cfg.distilled:
        params["pre_logits"] = _linear_init(keys[5], D, cfg.representation_size)
    return params


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def patch_embed(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) NHWC image -> (B, N, D) tokens via strided conv."""
    k = p["proj"]["kernel"].astype(x.dtype)
    ph, pw = k.shape[0], k.shape[1]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(ph, pw), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p["proj"]["bias"].astype(x.dtype)
    B, gh, gw, D = y.shape
    return y.reshape(B, gh * gw, D)


def dropout(x, rate, rng, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def drop_path(x, rate, rng, train):
    """Stochastic depth: drop the whole residual branch per sample."""
    if not train or rate <= 0.0 or rng is None:
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _attend(q, k, v, scale, *, train=False, attn_drop=0.0, rng=None):
    """Softmax attention over (B, N, H, hd). Routes to the fused Pallas
    kernel (ops/pallas_attention.py) when attention dropout is inactive;
    otherwise the jnp path (dropout needs the materialized matrix)."""
    if train and attn_drop > 0.0 and rng is not None:
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(attn * scale, axis=-1).astype(q.dtype)
        attn = dropout(attn, attn_drop, rng, train)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    from ..ops.pallas_attention import fused_mha
    return fused_mha(q, k, v, scale)   # native (B, N, H, hd) layout


def attention(p: Params, x: jnp.ndarray, *, num_heads: int, scale,
              train=False, attn_drop=0.0, proj_drop=0.0, rng=None
              ) -> jnp.ndarray:
    """Standard MHA (reference models/layers.py:368-394). q/k/v computed by a
    single fused projection; softmax in fp32."""
    B, N, _ = x.shape
    qkv = linear(p["qkv"], x)                           # (B, N, 3*H*hd)
    hd = qkv.shape[-1] // (3 * num_heads)
    qkv = qkv.reshape(B, N, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    y = _attend(q, k, v, scale, train=train, attn_drop=attn_drop, rng=r1)
    y = y.reshape(B, N, num_heads * hd)
    y = linear(p["proj"], y)
    if train and proj_drop > 0.0 and rng is not None:
        y = dropout(y, proj_drop, r2, train)
    return y


def mlp(p: Params, x: jnp.ndarray, *, train=False, drop=0.0, rng=None
        ) -> jnp.ndarray:
    y = jax.nn.gelu(linear(p["fc1"], x), approximate=False)
    if train and drop > 0.0 and rng is not None:
        rng, sub = jax.random.split(rng)
        y = dropout(y, drop, sub, train)
    y = linear(p["fc2"], y)
    if train and drop > 0.0 and rng is not None:
        _, sub = jax.random.split(rng)
        y = dropout(y, drop, sub, train)
    return y


def block_forward(p: Params, x: jnp.ndarray, cfg: ModelCfg, dp_rate: float,
                  *, train=False, rng=None, block_idx: int = 0
                  ) -> jnp.ndarray:
    num_heads, head_dim, _ = cfg.block_dims(block_idx)
    scale = cfg.qk_scale if cfg.qk_scale is not None else head_dim ** -0.5
    r1 = r2 = r3 = r4 = None
    if rng is not None:
        r1, r2, r3, r4 = jax.random.split(rng, 4)
    h = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps=cfg.ln_eps)
    h = attention(p["attn"], h, num_heads=num_heads, scale=scale,
                  train=train, attn_drop=cfg.attn_drop_rate,
                  proj_drop=cfg.drop_rate, rng=r1)
    x = x + drop_path(h, dp_rate, r2, train)
    h = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], eps=cfg.ln_eps)
    h = mlp(p["mlp"], h, train=train, drop=cfg.drop_rate, rng=r3)
    x = x + drop_path(h, dp_rate, r4, train)
    return x


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def vit_forward(params: Params, x: jnp.ndarray, cfg: ModelCfg, *,
                train: bool = False, rng=None,
                compute_dtype=jnp.bfloat16):
    """Dense ViT forward (reference vision_transformer.py:332-358).

    x: (B, H, W, C) in NHWC.
    Returns logits (B, classes); for distilled models in train mode returns
    (logits, logits_dist) like the reference; in eval mode their average.
    """
    x = x.astype(compute_dtype)
    B = x.shape[0]
    tok = patch_embed(params["patch_embed"], x)
    cls = jnp.broadcast_to(params["cls_token"].astype(tok.dtype),
                           (B, 1, tok.shape[-1]))
    if cfg.distilled:
        dist = jnp.broadcast_to(params["dist_token"].astype(tok.dtype),
                                (B, 1, tok.shape[-1]))
        tok = jnp.concatenate([cls, dist, tok], axis=1)
    else:
        tok = jnp.concatenate([cls, tok], axis=1)
    tok = tok + params["pos_embed"].astype(tok.dtype)

    rngs = jax.random.split(rng, cfg.depth + 1) if rng is not None else [
        None] * (cfg.depth + 1)
    tok = dropout(tok, cfg.drop_rate, rngs[-1], train)
    for i, (bp, dp) in enumerate(zip(params["blocks"],
                                     cfg.drop_path_schedule())):
        fwd = block_forward
        if cfg.remat:
            fwd = jax.checkpoint(
                lambda p, t, _cfg=cfg, _dp=dp, _i=i, _r=rngs[i]:
                block_forward(p, t, _cfg, _dp, train=train, rng=_r,
                              block_idx=_i))
            tok = fwd(bp, tok)
        else:
            tok = block_forward(bp, tok, cfg, dp, train=train, rng=rngs[i],
                                block_idx=i)
    tok = layer_norm(tok, params["norm"]["scale"], params["norm"]["bias"],
                     eps=cfg.ln_eps)

    if cfg.distilled:
        logits = linear(params["head"], tok[:, 0]).astype(jnp.float32)
        logits_d = linear(params["head_dist"], tok[:, 1]).astype(jnp.float32)
        if train:
            return logits, logits_d
        return (logits + logits_d) / 2.0
    feat = tok[:, 0]
    if "pre_logits" in params:
        feat = jnp.tanh(linear(params["pre_logits"], feat))
    return linear(params["head"], feat).astype(jnp.float32)


def dense_flops(cfg: ModelCfg) -> float:
    """Analytic FLOPs of the dense model, mirroring the reference accounting
    (reference vision_transformer.py:360-377 with MAEBlock terms
    :207-220, :404-414, :799-801). Returns GFLOPs."""
    N = cfg.num_patches
    D = cfg.embed_dim
    flops = N * D * 3 * cfg.patch_size ** 2                 # patch embed
    for i in range(cfg.depth):
        H, hd, hid = cfg.block_dims(i)
        flops += 2 * D * N                                  # norms
        flops += N * D * (3 * H * hd) + 3 * N * H * hd      # qkv
        flops += H * N * hd * N + H * N * N                 # q@k
        flops += 5 * H * N * N                              # softmax
        flops += H * N * N * hd                             # attn@v
        flops += N * (H * hd * D) + N * D                   # proj
        flops += (D * hid + hid * D + D + hid) * N          # mlp
    head_mult = 2 if cfg.distilled else 1
    flops += head_mult * D * cfg.num_classes
    return flops / 1e9
