"""Searchable MIM Vision Transformer — the OFB supernet, TPU-native.

Functional equivalent of the reference `MIMVisionTransformer`
(reference models/vision_transformer.py:380-950) with the searchable modules
`MAEPatchEmbed` / `MAESparseAttention` / `MAESparseMlp`
(reference models/layers.py:131-365, 416-771, 804-1049) expressed as
static-shape multiplicative gates:

  * all weights stay at their dense shapes for the whole search;
  * prune events only update the small `ArchState` arrays (switch cells,
    hard masks, flags — see core/compress.py);
  * a channel the reference would have physically sliced away is a channel
    whose `hard_mask` is 0 — every write into the residual stream is masked
    so such channels carry exactly 0, making the static model numerically
    equivalent to the reference's sliced model (up to the reference's
    channel-reordering quirks, documented in ops/gates.py).

The model is a pure function; one jit covers the whole search step.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

# Fold bi-mask gates into the matmul weights instead of the activations:
# a (D, 3HD) elementwise on the kernel replaces a (B, N, 3HD) one on the
# activations. Measured +5.8% step throughput on DeiT-S/v5e (BENCH.md);
# same math (grads flow to score/alpha through the kernel product).
# OFB_GATE_FOLD=0 restores the activation-side gating.
_GATE_FOLD = os.environ.get("OFB_GATE_FOLD", "1") == "1"

from ..ops import gates as G
from ..ops import pmim
from .search_space import ArchState, SearchSpace
from .vit import (ModelCfg, Params, dropout, drop_path, init_vit_params,
                  linear, patch_embed, trunc_normal)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_mim_params(key, cfg: ModelCfg, space: SearchSpace,
                    mae: bool = True) -> Params:
    """Dense ViT params + saliency scores + MIM decoder.

    Scores init: N(0, 0.2) (reference models/layers.py:155,467,824
    trunc_normal_(std=.2) with +-2 absolute bounds ~ untruncated normal).
    Non-searchable dims get score = 1 (reference layers.py:164,480,834).
    """
    kbase, ks, kd, km = jax.random.split(key, 4)
    params = init_vit_params(kbase, cfg)
    D, H, hd, hid = cfg.embed_dim, cfg.num_heads, cfg.hd, cfg.hidden

    sk = jax.random.split(ks, 2 * cfg.depth + 1)
    if space.embed.searchable:
        params["patch_embed"]["score"] = 0.2 * jax.random.normal(sk[0], (D,))
    else:
        params["patch_embed"]["score"] = jnp.ones((D,))
    for i in range(cfg.depth):
        bs = space.blocks[i]
        blk = params["blocks"][i]
        if bs.attn.searchable:
            shape = (H, 1) if len(bs.attn.chan_ratios) == 1 and \
                len(bs.attn.head_list) > 1 else (
                    (1, hd) if len(bs.attn.head_list) == 1 and
                    len(bs.attn.chan_ratios) > 1 else (H, hd))
            blk["attn"]["score"] = 0.2 * jax.random.normal(sk[1 + 2 * i], shape)
        else:
            blk["attn"]["score"] = jnp.ones((H, hd))
        if bs.mlp.searchable:
            blk["mlp"]["score"] = 0.2 * jax.random.normal(sk[2 + 2 * i], (hid,))
        else:
            blk["mlp"]["score"] = jnp.ones((hid,))

    if mae:
        params["mask_token"] = trunc_normal(km, (1, 1, D))
        # SimMIM one-layer decoder: 1x1 conv to p^2*3 + pixel shuffle
        # (reference models/vision_transformer.py:491-496)
        out_ch = cfg.patch_size ** 2 * cfg.in_chans
        kconv = trunc_normal(kd, (1, 1, D, out_ch))
        params["decoder"] = {"conv": {"kernel": kconv,
                                      "bias": jnp.zeros((out_ch,))}}
    return params


def init_alphas(key, space: SearchSpace) -> Params:
    """Arch parameters, uniform(0,1) like torch.rand
    (reference models/layers.py:147,455,817; vision_transformer.py:472)."""
    k1, k2, k3 = jax.random.split(key, 3)
    blocks = []
    bkeys = jax.random.split(k3, len(space.blocks) * 2)
    for i, b in enumerate(space.blocks):
        kh, kc = b.attn.num_cells
        blocks.append({
            "attn": jax.random.uniform(bkeys[2 * i], (kh, kc)),
            "mlp": jax.random.uniform(bkeys[2 * i + 1], (b.mlp.num_cells,)),
        })
    return {
        "patch": jax.random.uniform(k1, (space.patch.num_cells,)),
        "embed": jax.random.uniform(k2, (space.embed.num_cells,)),
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# Gated sub-layers
# ---------------------------------------------------------------------------

class EmbedGates(NamedTuple):
    gate: jnp.ndarray        # (D,) multiplicative gate (weighted_embedding)
    support: jnp.ndarray     # (D,) 0/1 — channels currently representable
    restore: jnp.ndarray     # (D,) restore-ordered weighted mask values


def embed_gates(params, alphas, arch: ArchState, space: SearchSpace,
                fused: bool) -> EmbedGates:
    """Patch-embed width gates (reference models/layers.py:173-200 and
    forward_features weighted_embedding, vision_transformer.py:617-624)."""
    e = arch.embed
    if fused:
        d = space.embed.dim
        return EmbedGates(gate=e.hard_mask, support=e.hard_mask,
                          restore=e.hard_mask)
    gate, restore = G.bimask_gate_1d(
        params["patch_embed"]["score"], alphas["embed"], e.switch,
        jnp.asarray(space.embed.mask_bank), e.hard_mask, e.w_p, e.finished)
    support = jnp.where(e.finished, e.hard_mask,
                        (restore > 0).astype(jnp.float32))
    return EmbedGates(gate=gate, support=support, restore=restore)


def gated_attention(p: Params, x: jnp.ndarray, alphas_blk, arch_blk,
                    space_blk, hard_embed: jnp.ndarray, cfg: ModelCfg,
                    fused: bool, *, train=False, rng=None) -> jnp.ndarray:
    """MAESparseAttention forward (reference models/layers.py:488-537).

    q/k/v are gated by the bi-mask before the attention matmuls; hard-dead
    heads produce v=0 so their output contribution is exactly 0 (the
    reference removes those qkv rows physically). Output writes are masked
    to live embed channels (the reference slices proj rows at embed prune
    events, layers.py:698-712).
    """
    a = arch_blk.attn
    B, N, _ = x.shape
    H, hd = a.hard_mask.shape
    if not fused:
        gate, _ = G.bimask_gate_attn(
            p["score"], alphas_blk["attn"], a.switch,
            jnp.asarray(space_blk.attn.mask_bank), a.hard_mask, a.w_p,
            a.finished)
        if _GATE_FOLD:
            # fold the gate into the qkv weights: a (D, 3HD) elementwise
            # instead of a (B, N, 3HD) one — candidate fusion, measured
            # via OFB_GATE_FOLD=1 (same math, grads flow to score/alpha
            # through the kernel product)
            g3 = jnp.tile(gate.reshape(-1), 3).astype(x.dtype)
            qkv = x @ (p["qkv"]["kernel"].astype(x.dtype) * g3[None, :])
            if "bias" in p["qkv"]:        # qkv_bias=False configs (miil)
                qkv = qkv + p["qkv"]["bias"].astype(x.dtype) * g3
            qkv = qkv.reshape(B, N, 3, H, hd)
        else:
            qkv = linear(p["qkv"], x).reshape(B, N, 3, H, hd)
            qkv = qkv * gate.astype(qkv.dtype)[None, None, None]
    else:
        qkv = linear(p["qkv"], x).reshape(B, N, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    from .vit import _attend
    y = _attend(q, k, v, a.scale, train=train,
                attn_drop=cfg.attn_drop_rate, rng=r1)
    y = y.reshape(B, N, H * hd)
    # hard_embed is exactly 0/1, so folding it into the proj columns is
    # bit-identical to masking the (B, N, D) output and much cheaper
    he = hard_embed.astype(x.dtype)
    y = y @ (p["proj"]["kernel"].astype(x.dtype) * he[None, :])
    if "bias" in p["proj"]:
        y = y + p["proj"]["bias"].astype(x.dtype) * he
    if train and cfg.drop_rate > 0.0 and rng is not None:
        y = dropout(y, cfg.drop_rate, r2, train)
    return y


def gated_mlp(p: Params, x: jnp.ndarray, alphas_blk, arch_blk, space_blk,
              hard_embed: jnp.ndarray, cfg: ModelCfg, fused: bool, *,
              train=False, rng=None) -> jnp.ndarray:
    """MAESparseMlp forward (reference models/layers.py:843-865)."""
    m = arch_blk.mlp
    if not fused:
        gate, _ = G.bimask_gate_1d(
            p["score"], alphas_blk["mlp"], m.switch,
            jnp.asarray(space_blk.mlp.mask_bank), m.hard_mask, m.w_p,
            m.finished)
        if _GATE_FOLD:
            g = gate.astype(x.dtype)
            h = x @ (p["fc1"]["kernel"].astype(x.dtype) * g[None, :])
            if "bias" in p["fc1"]:
                h = h + p["fc1"]["bias"].astype(x.dtype) * g
        else:
            h = linear(p["fc1"], x) * gate.astype(x.dtype)
    else:
        h = linear(p["fc1"], x)
    h = jax.nn.gelu(h, approximate=False)
    if train and cfg.drop_rate > 0.0 and rng is not None:
        rng, sub = jax.random.split(rng)
        h = dropout(h, cfg.drop_rate, sub, train)
    # 0/1 hard_embed folded into fc2 columns (see gated_attention)
    he = hard_embed.astype(x.dtype)
    h = h @ (p["fc2"]["kernel"].astype(x.dtype) * he[None, :])
    if "bias" in p["fc2"]:
        h = h + p["fc2"]["bias"].astype(x.dtype) * he
    if train and cfg.drop_rate > 0.0 and rng is not None:
        _, sub = jax.random.split(rng)
        h = dropout(h, cfg.drop_rate, sub, train)
    return h


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

class MimOutput(NamedTuple):
    logits: jnp.ndarray                   # (B, classes) fp32
    logits_dist: Optional[jnp.ndarray]    # distilled head or None
    decoder_loss: jnp.ndarray             # scalar fp32 (0 when MIM inactive)


def mim_forward(params: Params, alphas: Params, arch: ArchState,
                x: jnp.ndarray, cfg: ModelCfg, space: SearchSpace, *,
                train: bool, use_mim: bool, fused: bool = False,
                keep_ratio: Optional[jnp.ndarray] = None,
                rng=None, compute_dtype=jnp.bfloat16) -> MimOutput:
    """Search-mode forward (reference models/vision_transformer.py:614-745).

    Static args: `train`, `use_mim` (MIM masking+decoder active — the search
    phase), `fused` (post-fuse). Traced args: all params/arch state and the
    annealed `keep_ratio` (PMIM keep fraction).
    """
    imgs = x
    x = x.astype(compute_dtype)
    B = x.shape[0]
    D = cfg.embed_dim
    T = cfg.num_tokens
    n_rngs = cfg.depth + 3
    rngs = list(jax.random.split(rng, n_rngs)) if rng is not None else [
        None] * n_rngs

    eg = embed_gates(params, alphas, arch, space, fused)
    # patch-embed projection, gated; dropped-support channels are zeroed
    # (reference models/layers.py:191-195; norm is Identity for DeiT)
    if not fused:
        gs = eg.gate * eg.support
        if _GATE_FOLD:
            # fold the (D,) embed gate into the conv kernel/bias: a
            # (p, p, 3, D) elementwise instead of a (B, N, D) one
            pe = params["patch_embed"]["proj"]
            tok = patch_embed(
                {"proj": {"kernel": pe["kernel"] * gs[None, None, None, :],
                          "bias": pe["bias"] * gs}}, x)
        else:
            tok = patch_embed(params["patch_embed"], x)
            tok = tok * gs.astype(tok.dtype)
        we = eg.gate.astype(tok.dtype)          # weighted_embedding
    else:
        tok = patch_embed(params["patch_embed"], x)
        we = None

    pos = params["pos_embed"].astype(tok.dtype)
    tok = tok + (pos[:, T:] * we if we is not None else pos[:, T:])

    # PMIM random masking (after pos add, before cls concat —
    # reference vision_transformer.py:628-637)
    token_mask = None
    if train and use_mim and "mask_token" in params:
        L = cfg.num_patches
        kc = jnp.floor(L * keep_ratio).astype(jnp.int32)
        token_mask = pmim.random_token_mask(rngs[-1], B, L, kc)
        tm = token_mask[..., None].astype(tok.dtype)
        mt = params["mask_token"].astype(tok.dtype)
        fill = mt * we if we is not None else mt
        tok = tok * (1.0 - tm) + tm * fill

    cls = params["cls_token"].astype(tok.dtype) + pos[:, :1]
    if we is not None:
        cls = cls * we
    cls = jnp.broadcast_to(cls, (B, 1, D))
    if cfg.distilled:
        dist = params["dist_token"].astype(tok.dtype) + pos[:, 1:T]
        if we is not None:
            dist = dist * we
        dist = jnp.broadcast_to(dist, (B, 1, D))
        tok = jnp.concatenate([cls, dist, tok], axis=1)
    else:
        tok = jnp.concatenate([cls, tok], axis=1)
    tok = dropout(tok, cfg.drop_rate, rngs[-2], train)

    hard_e = arch.embed.hard_mask

    def block_body(tok, bp, blk_alphas, blk_arch, i, r, dp):
        ra = rb = rc = rd = None
        if r is not None:
            ra, rb, rc, rd = jax.random.split(r, 4)
        h = G.masked_layer_norm(tok, eg.support, bp["norm1"]["scale"],
                                bp["norm1"]["bias"], eps=cfg.ln_eps,
                                passthrough="identity")
        h = gated_attention(bp["attn"], h, blk_alphas, blk_arch,
                            space.blocks[i], hard_e, cfg, fused,
                            train=train, rng=ra)
        tok = tok + drop_path(h, dp, rb, train)
        h = G.masked_layer_norm(tok, eg.support, bp["norm2"]["scale"],
                                bp["norm2"]["bias"], eps=cfg.ln_eps,
                                passthrough="identity")
        h = gated_mlp(bp["mlp"], h, blk_alphas, blk_arch,
                      space.blocks[i], hard_e, cfg, fused, train=train,
                      rng=rc)
        return tok + drop_path(h, dp, rd, train)

    for i, (bp, dp) in enumerate(zip(params["blocks"],
                                     cfg.drop_path_schedule())):
        if cfg.remat:
            tok = jax.checkpoint(
                lambda t, b, a, ar, _i=i, _r=rngs[i], _dp=dp:
                block_body(t, b, a, ar, _i, _r, _dp)
            )(tok, bp, alphas["blocks"][i], arch.blocks[i])
        else:
            tok = block_body(tok, bp, alphas["blocks"][i], arch.blocks[i],
                             i, rngs[i], dp)

    latent = G.masked_layer_norm(tok, eg.support, params["norm"]["scale"],
                                 params["norm"]["bias"], eps=cfg.ln_eps,
                                 passthrough="zero")

    # MIM decode branch (reference models/vision_transformer.py:717-731)
    decoder_loss = jnp.asarray(0.0, jnp.float32)
    if train and use_mim and token_mask is not None:
        z = latent[:, T:]
        g = cfg.grid
        zimg = z.reshape(B, g, g, D)
        # 1x1 conv == matmul over the channel dim
        dk = params["decoder"]["conv"]["kernel"].astype(z.dtype)
        rec = zimg @ dk[0, 0]
        rec = rec + params["decoder"]["conv"]["bias"].astype(z.dtype)
        x_rec = pmim.pixel_shuffle_nhwc(rec, cfg.patch_size)
        decoder_loss = pmim.mim_reconstruction_loss(
            imgs.astype(jnp.float32), x_rec, token_mask, cfg.patch_size,
            cfg.in_chans)

    logits = linear(params["head"], latent[:, 0]).astype(jnp.float32)
    logits_dist = None
    if cfg.distilled:
        logits_dist = linear(params["head_dist"],
                             latent[:, 1]).astype(jnp.float32)
        if not train:
            logits = (logits + logits_dist) / 2.0
            logits_dist = None
    return MimOutput(logits=logits, logits_dist=logits_dist,
                     decoder_loss=decoder_loss)


def fuse_params(params: Params, arch: ArchState, space: SearchSpace,
                cfg: ModelCfg) -> Tuple[Params, ArchState]:
    """Fold saliency scores into the weights (one-time, post-search).

    Mirrors reference `MIMVisionTransformer.fuse`
    (models/vision_transformer.py:747-757) + per-module fuse
    (models/layers.py:202-206, 539-543, 867-871):
      tokens/pos_embed/mask_token *= embed score;
      patch-embed conv rows *= embed score;
      qkv rows *= attn score; fc1 rows *= mlp score.
    Requires every module finished (scores are the post-convergence linear
    gates, zero on dead dims).
    """
    p = jax.tree_util.tree_map(lambda a: a, params)  # shallow-ish copy
    es = params["patch_embed"]["score"]
    p["patch_embed"] = dict(params["patch_embed"])
    p["patch_embed"]["proj"] = {
        "kernel": params["patch_embed"]["proj"]["kernel"] * es[None, None, None, :],
        "bias": params["patch_embed"]["proj"]["bias"] * es,
    }
    p["cls_token"] = params["cls_token"] * es
    p["pos_embed"] = params["pos_embed"] * es
    if "dist_token" in params:
        p["dist_token"] = params["dist_token"] * es
    if "mask_token" in params:
        p["mask_token"] = params["mask_token"] * es
    new_blocks = []
    for i, bp in enumerate(params["blocks"]):
        H, hd = arch.blocks[i].attn.hard_mask.shape
        a_score = jnp.broadcast_to(bp["attn"]["score"], (H, hd)).reshape(-1)
        qkv_scale = jnp.tile(a_score, 3)
        nb = dict(bp)
        nb["attn"] = dict(bp["attn"])
        nb["attn"]["qkv"] = {
            "kernel": bp["attn"]["qkv"]["kernel"] * qkv_scale[None, :],
            "bias": bp["attn"]["qkv"]["bias"] * qkv_scale
            if "bias" in bp["attn"]["qkv"] else None,
        }
        if nb["attn"]["qkv"]["bias"] is None:
            del nb["attn"]["qkv"]["bias"]
        m_score = bp["mlp"]["score"]
        nb["mlp"] = dict(bp["mlp"])
        nb["mlp"]["fc1"] = {
            "kernel": bp["mlp"]["fc1"]["kernel"] * m_score[None, :],
            "bias": bp["mlp"]["fc1"]["bias"] * m_score,
        }
        new_blocks.append(nb)
    p["blocks"] = new_blocks
    return p, arch.replace(fused=jnp.asarray(True))
