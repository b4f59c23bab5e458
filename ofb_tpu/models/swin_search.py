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
from .mim_vit import _GATE_FOLD
from .swin import _swin_pack
from .search_space import (ArchState, AttnSpace, BlockSpace, DimArch,
                           DimSpace, PatchSpace, SearchSpace)
from .swin import (SwinCfg, init_swin_params, relative_position_index,
                   shifted_window_mask, window_partition, window_reverse)
from .vit import Params, drop_path, linear, layer_norm as _ln  # noqa: F401
from ..ops.gates import layer_norm


def build_swin_space(cfg: SwinCfg, *, attn_search=True, mlp_search=True,
                     head_search=False, channel_search=False,
                     embed_search=False) -> SearchSpace:
    """Per-block spaces across all stages; the global embed/patch slots are
    born finished. embed_search=True adds a per-stage residual-width
    DimSpace whose keep set propagates through the patch-merging concat
    (the OFB-Swin extension; reference README.md:27-31 lists the family
    without shipping code)."""
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
    from .search_space import embed_ratio_grid
    stage_embeds = tuple(
        DimSpace(cfg.stage_dim(s), embed_ratio_grid(cfg.stage_dim(s)), True)
        for s in range(cfg.num_stages)) if embed_search else ()
    return SearchSpace(
        embed=DimSpace(cfg.embed_dim, (1.0,), False),
        blocks=tuple(blocks),
        patch=PatchSpace(1, (1.0,), False),
        stage_embeds=stage_embeds,
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
    if space.stage_embeds:
        ekeys = jax.random.split(jax.random.fold_in(key, 99),
                                 2 * len(space.stage_embeds))
        alphas["stage_embeds"] = [
            jax.random.uniform(ekeys[2 * s], (ds.num_cells,))
            for s, ds in enumerate(space.stage_embeds)]
        for s, ds in enumerate(space.stage_embeds):
            params["stages"][s]["embed_score"] = 0.2 * jax.random.normal(
                ekeys[2 * s + 1], (ds.dim,))
    return params, alphas, ArchState.create(space)


# ---------------------------------------------------------------------------
# gated forward
# ---------------------------------------------------------------------------

def _gated_window_attention(p, x, heads, w, rel_idx, mask, blk_alphas,
                            blk_arch, blk_space, fused, hard_embed=None,
                            pack: int = 1):
    Bw0, N0, C = x.shape
    packed = (pack > 1 and Bw0 % pack == 0
              and (mask is None or mask.shape[0] % pack == 0))
    if packed:
        # block-diagonal window packing (see swin._window_attention):
        # identical math, better MXU tile fill at N=49 (BENCH.md round 3)
        x = x.reshape(Bw0 // pack, pack * N0, C)
    Bw, N, C = x.shape
    hd = C // heads
    a = blk_arch.attn
    if not fused:
        gate, _ = G.bimask_gate_attn(
            p["score"], blk_alphas["attn"], a.switch,
            jnp.asarray(blk_space.attn.mask_bank), a.hard_mask, a.w_p,
            a.finished)
        if _GATE_FOLD:
            # fold the (H, hd) gate into the qkv kernel columns (3-major
            # layout matches the reshape below); a (C, 3Hhd) elementwise
            # instead of a (Bw, N, 3Hhd) one — see mim_vit.gated_attention
            g3 = jnp.tile(gate.reshape(-1), 3).astype(x.dtype)
            qkv = (x @ (p["qkv"]["kernel"].astype(x.dtype) * g3[None, :])
                   + p["qkv"]["bias"].astype(x.dtype) * g3)
            qkv = qkv.reshape(Bw, N, 3, heads, hd)
        else:
            qkv = linear(p["qkv"], x).reshape(Bw, N, 3, heads, hd)
            qkv = qkv * gate.astype(qkv.dtype)[None, None, None]
    else:
        qkv = linear(p["qkv"], x).reshape(Bw, N, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * a.scale
    bias = jnp.take(p["rel_bias"].astype(jnp.float32), rel_idx.reshape(-1),
                    axis=0).reshape(N0, N0, heads).transpose(2, 0, 1)
    if packed:
        from .swin import _block_diag_pack
        bias = _block_diag_pack(jnp.broadcast_to(bias[:, None],
                                                 (heads, pack, N0, N0)),
                                pack, 0.0)[:, 0]       # (heads, N, N)
        attn = attn + bias[None]
        attn = attn + jnp.asarray(
            np.kron(1.0 - np.eye(pack, dtype=np.float32),
                    np.ones((N0, N0), np.float32)) * -1e9)[None, None]
        if mask is not None:
            nW = mask.shape[0]
            mp = _block_diag_pack(mask, pack, 0.0)     # (nW/pack, N, N)
            attn = attn.reshape(Bw // (nW // pack), nW // pack, heads,
                                N, N) + mp[None, :, None]
            attn = attn.reshape(Bw, heads, N, N)
    else:
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bw // nW, nW, heads, N, N) + \
                mask[None, :, None]
            attn = attn.reshape(Bw, heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bw, N, C)
    if hard_embed is not None:
        # 0/1 embed mask folded into proj columns — bit-identical to
        # masking the (Bw, N, C) output, much cheaper
        he = hard_embed.astype(x.dtype)
        out = y @ (p["proj"]["kernel"].astype(x.dtype) * he[None, :]) \
            + p["proj"]["bias"].astype(x.dtype) * he
    else:
        out = linear(p["proj"], y)
    if packed:
        out = out.reshape(Bw0, N0, out.shape[-1])
    return out


def _stage_embed_gates(params, alphas, arch: ArchState, space: SearchSpace,
                       fused: bool):
    """Per-stage (gate, support, hard) triples, or None without embed
    search. Mirrors the ViT embed_gates (mim_vit.py:112-126): gate is the
    weighted embedding applied at the stage's stream SOURCE (patch embed /
    patch-merging reduction), support masks the LN moments, hard masks
    residual writes."""
    if not space.stage_embeds:
        return None
    out = []
    for s, ds in enumerate(space.stage_embeds):
        ea = arch.stage_embeds[s]
        if fused:
            out.append((ea.hard_mask, ea.hard_mask, ea.hard_mask))
            continue
        gate, restore = G.bimask_gate_1d(
            params["stages"][s]["embed_score"], alphas["stage_embeds"][s],
            ea.switch, jnp.asarray(ds.mask_bank), ea.hard_mask, ea.w_p,
            ea.finished)
        support = jnp.where(ea.finished, ea.hard_mask,
                            (restore > 0).astype(jnp.float32))
        out.append((gate, support, ea.hard_mask))
    return out


def swin_search_forward(params: Params, alphas, arch: ArchState,
                        x: jnp.ndarray, cfg: SwinCfg, space: SearchSpace, *,
                        train: bool = False, fused: bool = False, rng=None,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Gated Swin forward; returns fp32 logits."""
    x = x.astype(compute_dtype)
    eg = _stage_embed_gates(params, alphas, arch, space, fused)
    kern = params["patch_embed"]["proj"]["kernel"].astype(x.dtype)
    p = cfg.patch_size
    h = jax.lax.conv_general_dilated(
        x, kern, (p, p), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = h + params["patch_embed"]["proj"]["bias"].astype(x.dtype)
    if eg is not None:
        g0, s0, _ = eg[0]
        if not fused:
            h = h * (g0 * s0).astype(h.dtype)
        h = G.masked_layer_norm(h, s0, params["patch_embed"]["norm"]["scale"],
                                params["patch_embed"]["norm"]["bias"],
                                eps=cfg.ln_eps, passthrough="zero")
    else:
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
        support = eg[s][1] if eg is not None else None
        hard = eg[s][2] if eg is not None else None

        def _ln(x2d, lp, passthrough="identity"):
            if support is None:
                return layer_norm(x2d, lp["scale"], lp["bias"],
                                  eps=cfg.ln_eps)
            return G.masked_layer_norm(x2d, support, lp["scale"],
                                       lp["bias"], eps=cfg.ln_eps,
                                       passthrough=passthrough)

        shift_mask = jnp.asarray(shifted_window_mask(res, w, w // 2)) \
            if res > w else None
        for b, bp in enumerate(stage["blocks"]):
            shift = (w // 2) if (b % 2 == 1 and res > w) else 0
            B_, H_, W_, C_ = h.shape
            sc = _ln(h.reshape(B_, -1, C_),
                     bp["norm1"]).reshape(B_, H_, W_, C_)
            if shift:
                sc = jnp.roll(sc, (-shift, -shift), axis=(1, 2))
            win = window_partition(sc, w)
            att = _gated_window_attention(
                bp["attn"], win, heads, w, rel_idx,
                shift_mask if shift else None, alphas["blocks"][gi],
                arch.blocks[gi], space.blocks[gi], fused,
                hard_embed=hard,   # residual writes masked to live channels
                pack=_swin_pack())
            att = window_reverse(att, w, H_, W_)
            if shift:
                att = jnp.roll(att, (shift, shift), axis=(1, 2))
            h = h + drop_path(att, dps[gi], next(rngs), train)

            mlp_in = _ln(h.reshape(B_, -1, C_), bp["norm2"])
            m = arch.blocks[gi].mlp
            if not fused:
                gate, _ = G.bimask_gate_1d(
                    bp["mlp"]["score"], alphas["blocks"][gi]["mlp"],
                    m.switch, jnp.asarray(space.blocks[gi].mlp.mask_bank),
                    m.hard_mask, m.w_p, m.finished)
                if _GATE_FOLD:
                    g = gate.astype(mlp_in.dtype)
                    y = mlp_in @ (bp["mlp"]["fc1"]["kernel"].astype(
                        mlp_in.dtype) * g[None, :]) \
                        + bp["mlp"]["fc1"]["bias"].astype(mlp_in.dtype) * g
                else:
                    y = linear(bp["mlp"]["fc1"], mlp_in)
                    y = y * gate.astype(y.dtype)
            else:
                y = linear(bp["mlp"]["fc1"], mlp_in)
            y = jax.nn.gelu(y, approximate=False)
            if hard is not None:
                he = hard.astype(y.dtype)
                y = (y @ (bp["mlp"]["fc2"]["kernel"].astype(y.dtype)
                          * he[None, :])
                     + bp["mlp"]["fc2"]["bias"].astype(y.dtype) * he
                     ).reshape(B_, H_, W_, C_)
            else:
                y = linear(bp["mlp"]["fc2"], y).reshape(B_, H_, W_, C_)
            h = h + drop_path(y, dps[gi], next(rngs), train)
            gi += 1

        if "downsample" in stage:
            B_, H_, W_, C_ = h.shape
            h = h.reshape(B_, H_ // 2, 2, W_ // 2, 2, C_)
            h = h.transpose(0, 1, 3, 4, 2, 5).reshape(
                B_, H_ // 2, W_ // 2, 4 * C_)
            if support is None:
                h = layer_norm(h, stage["downsample"]["norm"]["scale"],
                               stage["downsample"]["norm"]["bias"],
                               eps=cfg.ln_eps)
            else:
                # channel c of stage s appears at positions j*C + c in the
                # 2x2 concat -> the support tiles 4x
                h = G.masked_layer_norm(
                    h, jnp.tile(support, 4),
                    stage["downsample"]["norm"]["scale"],
                    stage["downsample"]["norm"]["bias"], eps=cfg.ln_eps,
                    passthrough="zero")
            h = h @ stage["downsample"]["reduction"]["kernel"].astype(h.dtype)
            if eg is not None:
                # the reduction is the source of stage s+1's stream: apply
                # the next stage's weighted embedding (patch-embed analog)
                g1, s1, _ = eg[s + 1]
                if not fused:
                    h = h * (g1 * s1).astype(h.dtype)
                else:
                    h = h * s1.astype(h.dtype)

    B_, H_, W_, C_ = h.shape
    if eg is not None:
        h = G.masked_layer_norm(h.reshape(B_, -1, C_), eg[-1][1],
                                params["norm"]["scale"],
                                params["norm"]["bias"], eps=cfg.ln_eps,
                                passthrough="zero")
    else:
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
    def stage_de(s):
        """Searched alive width of stage s (dense width without search)."""
        if not space.stage_embeds:
            return jnp.asarray(float(cfg.stage_dim(s)), jnp.float32)
        return jnp.sum(
            masked_softmax(alphas["stage_embeds"][s],
                           arch.stage_embeds[s].switch)
            * jnp.asarray(space.stage_embeds[s].cell_sizes))

    total = 0.0
    searched = jnp.asarray(0.0, jnp.float32)
    p2 = float(cfg.patch_size ** 2)
    res0 = cfg.stage_res(0)
    total += (res0 ** 2) * cfg.embed_dim * 3.0 * p2
    searched = searched + (res0 ** 2) * stage_de(0) * 3.0 * p2
    gi = 0
    w2 = float(cfg.window ** 2)
    for s in range(cfg.num_stages):
        dim = float(cfg.stage_dim(s))
        de = stage_de(s)
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
            searched = searched + 2.0 * de * tokens
            searched = searched + tokens * de * 3.0 * sd / (heads * hd) \
                * dim + 3.0 * tokens * sd
            aH = ba.attn.head_alive.astype(jnp.float32)
            searched = searched + n_win * (sd / (heads * hd) * heads * w2
                                           * hd * w2 * 2.0
                                           + 6.0 * aH * w2 * w2)
            searched = searched + tokens * sd * de + tokens * de
            searched = searched + (de * am + am * de + de + am) * tokens
            gi += 1
        if s < cfg.num_stages - 1:
            # patch merging: norm over 4C + reduction (tokens/4, 4C)@(4C, 2C)
            t4 = tokens / 4.0
            dnext = float(cfg.stage_dim(s + 1))
            total += t4 * 4.0 * dim + t4 * 4.0 * dim * dnext
            searched = searched + t4 * 4.0 * de \
                + t4 * 4.0 * de * stage_de(s + 1)
    C = float(cfg.num_classes)
    D_last = float(cfg.stage_dim(cfg.num_stages - 1))
    total += D_last * C
    searched = searched + stage_de(cfg.num_stages - 1) * C
    return jnp.asarray(total, jnp.float32) / 1e9, searched / 1e9


def export_swin_subnet(params: Params, arch: ArchState, space: SearchSpace,
                       cfg: SwinCfg) -> Tuple[Params, SwinCfg, Dict]:
    """Slice converged attn/mlp dims per block and (with embed search) the
    per-stage residual widths through the patch-merging concat.

    Scores must be the post-convergence linear gates; they are folded into
    qkv / fc1 rows (attn/mlp) and into the stage's stream source — the
    patch-embed conv / patch-merging reduction columns — for embed scores,
    so the sliced model needs no gate. The exported net runs through the
    plain `swin_forward` (shape-driven widths).
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

    if space.stage_embeds:
        keeps = [np.where(np.asarray(arch.stage_embeds[s].hard_mask) > 0)[0]
                 for s in range(len(space.stage_embeds))]
        scores = [np.asarray(params["stages"][s]["embed_score"])
                  for s in range(len(space.stage_embeds))]
        k0, s0 = keeps[0], scores[0]
        pe = out["patch_embed"]
        pe["proj"]["kernel"] = np.asarray(
            pe["proj"]["kernel"])[..., k0] * s0[k0]
        pe["proj"]["bias"] = np.asarray(pe["proj"]["bias"])[k0] * s0[k0]
        pe["norm"]["scale"] = np.asarray(pe["norm"]["scale"])[k0]
        pe["norm"]["bias"] = np.asarray(pe["norm"]["bias"])[k0]
        for s, stage in enumerate(out["stages"]):
            ks = keeps[s]
            C = int(np.asarray(arch.stage_embeds[s].hard_mask).shape[0])
            for bp in stage["blocks"]:
                for nm in ("norm1", "norm2"):
                    bp[nm]["scale"] = np.asarray(bp[nm]["scale"])[ks]
                    bp[nm]["bias"] = np.asarray(bp[nm]["bias"])[ks]
                bp["attn"]["qkv"]["kernel"] = np.asarray(
                    bp["attn"]["qkv"]["kernel"])[ks, :]
                bp["attn"]["proj"]["kernel"] = np.asarray(
                    bp["attn"]["proj"]["kernel"])[:, ks]
                bp["attn"]["proj"]["bias"] = np.asarray(
                    bp["attn"]["proj"]["bias"])[ks]
                bp["mlp"]["fc1"]["kernel"] = np.asarray(
                    bp["mlp"]["fc1"]["kernel"])[ks, :]
                bp["mlp"]["fc2"]["kernel"] = np.asarray(
                    bp["mlp"]["fc2"]["kernel"])[:, ks]
                bp["mlp"]["fc2"]["bias"] = np.asarray(
                    bp["mlp"]["fc2"]["bias"])[ks]
            if "downsample" in stage:
                # channel c appears at positions j*C + c in the 2x2 concat
                tiled = np.concatenate([ks + j * C for j in range(4)])
                dn = stage["downsample"]
                dn["norm"]["scale"] = np.asarray(dn["norm"]["scale"])[tiled]
                dn["norm"]["bias"] = np.asarray(dn["norm"]["bias"])[tiled]
                kn, sn = keeps[s + 1], scores[s + 1]
                dn["reduction"]["kernel"] = np.asarray(
                    dn["reduction"]["kernel"])[tiled][:, kn] * sn[kn]
            del stage["embed_score"]
        kl = keeps[-1]
        out["norm"]["scale"] = np.asarray(out["norm"]["scale"])[kl]
        out["norm"]["bias"] = np.asarray(out["norm"]["bias"])[kl]
        out["head"]["kernel"] = np.asarray(out["head"]["kernel"])[kl, :]
        meta["stage_dims"] = [int(len(k)) for k in keeps]

    return jax.tree_util.tree_map(jnp.asarray, out), cfg, meta
