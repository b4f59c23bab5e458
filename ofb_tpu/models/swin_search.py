"""Searchable Swin: OFB bi-mask search over window-attention (head x
channel) and MLP hidden dims, per block.

The reference lists unreleased OFB-Swin results (reference README.md:27-31)
without shipping code; this applies the same method to the Swin family,
reusing the DeiT machinery wholesale:

  * grids / gates / rank-restore:  models/search_space.py, ops/gates.py
  * compress state machine:        core/compress.py (the embed and patch
    dimensions are constructed born-finished, so only the per-block attn
    and mlp cells participate — patch-merging ties the embed widths across
    stages, so embed search is future work)
  * export:                        physical slicing per block (no
    model-wide embed propagation needed, simpler than the ViT case)

Because Swin block dims differ per stage, `alphas["blocks"]` /
`arch.blocks` flatten all stages' blocks into one list, and the search
space records each block's own AttnSpace/DimSpace.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import gates as G
from ..ops.gates import masked_softmax
from .search_space import (ArchState, AttnSpace, BlockSpace, DimArch,
                           DimSpace, PatchSpace, SearchSpace)
from .swin import (SwinCfg, init_swin_params, relative_position_index,
                   shifted_window_mask, window_partition, window_reverse)
from .vit import Params, drop_path, linear, layer_norm as _ln  # noqa: F401
from ..ops.gates import layer_norm


def build_swin_space(cfg: SwinCfg, *, attn_search=True, mlp_search=True,
                     head_search=False, channel_search=False) -> SearchSpace:
    """Per-block spaces across all stages; embed/patch born finished."""
    blocks: List[BlockSpace] = []
    for s in range(cfg.num_stages):
        dim = cfg.stage_dim(s)
        heads = cfg.num_heads[s]
        hd = dim // heads
        hidden = int(dim * cfg.mlp_ratio)
        for _ in range(cfg.depths[s]):
            blocks.append(BlockSpace(
                attn=AttnSpace.build(heads, hd, head_search, channel_search,
                                     attn_search),
                mlp=DimSpace(hidden,
                             tuple(i / hidden for i in
                                   range(hidden // 4, hidden + 1,
                                         hidden // 8)) if mlp_search
                             else (1.0,), mlp_search),
            ))
    return SearchSpace(
        embed=DimSpace(cfg.embed_dim, (1.0,), False),
        blocks=tuple(blocks),
        patch=PatchSpace(1, (1.0,), False),
    )


def init_swin_search(key, cfg: SwinCfg, space: SearchSpace):
    """params (+ per-block scores), alphas, arch."""
    kp, ks, ka = jax.random.split(key, 3)
    params = init_swin_params(kp, cfg)
    skeys = jax.random.split(ks, 2 * len(space.blocks))
    akeys = jax.random.split(ka, 2 * len(space.blocks))
    alphas_blocks = []
    j = 0
    for s in range(cfg.num_stages):
        for b in range(cfg.depths[s]):
            bs = space.blocks[j]
            blk = params["stages"][s]["blocks"][b]
            H, hd = bs.attn.num_heads, bs.attn.head_dim
            kh, kc = bs.attn.num_cells
            # joint: (H, hd); head-only: (H, 1); channel-only: (1, hd)
            if kh > 1 and kc == 1:
                sshape = (H, 1)
            elif kh == 1 and kc > 1:
                sshape = (1, hd)
            else:
                sshape = (H, hd)
            blk["attn"]["score"] = 0.2 * jax.random.normal(
                skeys[2 * j], sshape)
            blk["mlp"]["score"] = 0.2 * jax.random.normal(
                skeys[2 * j + 1], (bs.mlp.dim,))
            alphas_blocks.append({
                "attn": jax.random.uniform(akeys[2 * j], bs.attn.num_cells),
                "mlp": jax.random.uniform(akeys[2 * j + 1],
                                          (bs.mlp.num_cells,)),
            })
            j += 1
    alphas = {
        "patch": jnp.ones((1,)),
        "embed": jnp.ones((1,)),
        "blocks": alphas_blocks,
    }
    return params, alphas, ArchState.create(space)


# ---------------------------------------------------------------------------
# gated forward
# ---------------------------------------------------------------------------

def _gated_window_attention(p, x, heads, w, rel_idx, mask, blk_alphas,
                            blk_arch, blk_space, fused):
    Bw, N, C = x.shape
    hd = C // heads
    qkv = linear(p["qkv"], x).reshape(Bw, N, 3, heads, hd)
    a = blk_arch.attn
    if not fused:
        gate, _ = G.bimask_gate_attn(
            p["score"], blk_alphas["attn"], a.switch,
            jnp.asarray(blk_space.attn.mask_bank), a.hard_mask, a.w_p,
            a.finished)
        qkv = qkv * gate.astype(qkv.dtype)[None, None, None]
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * a.scale
    bias = jnp.take(p["rel_bias"].astype(jnp.float32), rel_idx.reshape(-1),
                    axis=0).reshape(N, N, heads).transpose(2, 0, 1)
    attn = attn + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(Bw // nW, nW, heads, N, N) + mask[None, :, None]
        attn = attn.reshape(Bw, heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bw, N, C)
    return linear(p["proj"], y)


def swin_search_forward(params: Params, alphas, arch: ArchState,
                        x: jnp.ndarray, cfg: SwinCfg, space: SearchSpace, *,
                        train: bool = False, fused: bool = False, rng=None,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Gated Swin forward; returns fp32 logits."""
    x = x.astype(compute_dtype)
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
    gi = 0
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
            att = _gated_window_attention(
                bp["attn"], win, heads, w, rel_idx,
                shift_mask if shift else None, alphas["blocks"][gi],
                arch.blocks[gi], space.blocks[gi], fused)
            att = window_reverse(att, w, H_, W_)
            if shift:
                att = jnp.roll(att, (shift, shift), axis=(1, 2))
            h = h + drop_path(att, dps[gi], next(rngs), train)

            mlp_in = layer_norm(h.reshape(B_, -1, C_), bp["norm2"]["scale"],
                                bp["norm2"]["bias"], eps=cfg.ln_eps)
            y = linear(bp["mlp"]["fc1"], mlp_in)
            m = arch.blocks[gi].mlp
            if not fused:
                gate, _ = G.bimask_gate_1d(
                    bp["mlp"]["score"], alphas["blocks"][gi]["mlp"],
                    m.switch, jnp.asarray(space.blocks[gi].mlp.mask_bank),
                    m.hard_mask, m.w_p, m.finished)
                y = y * gate.astype(y.dtype)
            y = jax.nn.gelu(y, approximate=False)
            y = linear(bp["mlp"]["fc2"], y).reshape(B_, H_, W_, C_)
            h = h + drop_path(y, dps[gi], next(rngs), train)
            gi += 1

        if "downsample" in stage:
            B_, H_, W_, C_ = h.shape
            h = h.reshape(B_, H_ // 2, 2, W_ // 2, 2, C_)
            h = h.transpose(0, 1, 3, 4, 2, 5).reshape(
                B_, H_ // 2, W_ // 2, 4 * C_)
            h = layer_norm(h, stage["downsample"]["norm"]["scale"],
                           stage["downsample"]["norm"]["bias"],
                           eps=cfg.ln_eps)
            h = h @ stage["downsample"]["reduction"]["kernel"].astype(h.dtype)

    B_, H_, W_, C_ = h.shape
    h = layer_norm(h.reshape(B_, -1, C_), params["norm"]["scale"],
                   params["norm"]["bias"], eps=cfg.ln_eps)
    feat = jnp.mean(h, axis=1)
    return linear(params["head"], feat).astype(jnp.float32)


# ---------------------------------------------------------------------------
# FLOPs model (per-block, differentiable in alpha — same accounting style
# as ops/flops.py for the ViT)
# ---------------------------------------------------------------------------

def swin_model_flops(alphas, arch: ArchState, space: SearchSpace,
                     cfg: SwinCfg) -> Tuple[jnp.ndarray, jnp.ndarray]:
    total = 0.0
    searched = jnp.asarray(0.0, jnp.float32)
    p2 = float(cfg.patch_size ** 2)
    res0 = cfg.stage_res(0)
    total += (res0 ** 2) * cfg.embed_dim * 3.0 * p2
    searched = searched + (res0 ** 2) * cfg.embed_dim * 3.0 * p2
    gi = 0
    w2 = float(cfg.window ** 2)
    for s in range(cfg.num_stages):
        dim = float(cfg.stage_dim(s))
        res = cfg.stage_res(s)
        tokens = float(res * res)
        n_win = tokens / w2
        heads = float(cfg.num_heads[s])
        hd = dim / heads
        hidden = float(int(dim * cfg.mlp_ratio))
        for _ in range(cfg.depths[s]):
            bs = space.blocks[gi]
            ba = arch.blocks[gi]
            sd = jnp.sum(masked_softmax(alphas["blocks"][gi]["attn"],
                                        ba.attn.switch)
                         * jnp.asarray(bs.attn.cell_sizes))
            am = masked_softmax(alphas["blocks"][gi]["mlp"],
                                ba.mlp.switch) @ \
                jnp.asarray(bs.mlp.cell_sizes)
            # norms + qkv + attention (within windows) + proj + mlp
            total += 2.0 * dim * tokens
            total += tokens * dim * 3.0 * dim + 3.0 * tokens * dim
            total += n_win * (heads * w2 * hd * w2 * 2.0 + 6.0 * heads
                              * w2 * w2)
            total += tokens * dim * dim + tokens * dim
            total += (2.0 * dim * hidden + dim + hidden) * tokens
            searched = searched + 2.0 * dim * tokens
            searched = searched + tokens * dim * 3.0 * sd / (heads * hd) \
                * dim + 3.0 * tokens * sd
            aH = ba.attn.head_alive.astype(jnp.float32)
            searched = searched + n_win * (sd / (heads * hd) * heads * w2
                                           * hd * w2 * 2.0
                                           + 6.0 * aH * w2 * w2)
            searched = searched + tokens * sd * dim + tokens * dim
            searched = searched + (dim * am + am * dim + dim + am) * tokens
            gi += 1
    C = float(cfg.num_classes)
    D_last = float(cfg.stage_dim(cfg.num_stages - 1))
    total += D_last * C
    searched = searched + D_last * C
    return jnp.asarray(total, jnp.float32) / 1e9, searched / 1e9


def export_swin_subnet(params: Params, arch: ArchState, space: SearchSpace,
                       cfg: SwinCfg) -> Tuple[Params, SwinCfg, Dict]:
    """Slice converged attn/mlp dims per block; embed dims untouched.

    Scores must be the post-convergence linear gates; they are folded into
    qkv / fc1 rows here (the fuse step), so the sliced model needs no gate.
    """
    import copy
    out = copy.deepcopy(jax.device_get(params))
    meta = {"blocks": []}
    gi = 0
    for s in range(cfg.num_stages):
        for b in range(cfg.depths[s]):
            bp = out["stages"][s]["blocks"][b]
            ba = arch.blocks[gi]
            bs = space.blocks[gi]
            H, hd = bs.attn.num_heads, bs.attn.head_dim
            # fuse scores
            a_score = np.broadcast_to(np.asarray(bp["attn"]["score"]),
                                      (H, hd)).reshape(-1)
            qkv_scale = np.tile(a_score, 3)
            bp["attn"]["qkv"]["kernel"] = np.asarray(
                bp["attn"]["qkv"]["kernel"]) * qkv_scale[None, :]
            bp["attn"]["qkv"]["bias"] = np.asarray(
                bp["attn"]["qkv"]["bias"]) * qkv_scale
            m_score = np.asarray(bp["mlp"]["score"])
            bp["mlp"]["fc1"]["kernel"] = np.asarray(
                bp["mlp"]["fc1"]["kernel"]) * m_score[None, :]
            bp["mlp"]["fc1"]["bias"] = np.asarray(
                bp["mlp"]["fc1"]["bias"]) * m_score
            # fold the searched softmax scale into the q columns: the
            # supernet attends with arch.scale (= chan_cnt**-0.5 after a
            # channel trim, compress.py:158) while the exported dense
            # forward uses hd**-0.5 (_window_attention), so scale q by the
            # ratio to keep gated == sliced exactly.
            dim = H * hd
            ratio = float(np.asarray(ba.attn.scale)) / (hd ** -0.5)
            if ratio != 1.0:
                k = bp["attn"]["qkv"]["kernel"]
                k[:, :dim] = k[:, :dim] * ratio
                bb = bp["attn"]["qkv"]["bias"]
                bb[:dim] = bb[:dim] * ratio
            # NOTE: qkv head-channel slicing changes per-head widths inside
            # the fixed window attention; round 1 keeps the dense qkv with
            # zero rows (numerically identical) and slices only the MLP,
            # which carries ~2/3 of Swin FLOPs.
            m_keep = np.where(np.asarray(ba.mlp.hard_mask) > 0)[0]
            bp["mlp"]["fc1"]["kernel"] = bp["mlp"]["fc1"]["kernel"][:, m_keep]
            bp["mlp"]["fc1"]["bias"] = bp["mlp"]["fc1"]["bias"][m_keep]
            bp["mlp"]["fc2"]["kernel"] = np.asarray(
                bp["mlp"]["fc2"]["kernel"])[m_keep, :]
            del bp["attn"]["score"], bp["mlp"]["score"]
            meta["blocks"].append({"mlp_hidden": int(len(m_keep))})
            gi += 1
    return jax.tree_util.tree_map(jnp.asarray, out), cfg, meta
