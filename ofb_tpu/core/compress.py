"""Compress state machine: cell kill / trim / convergence, statically.

The reference's `compress()` physically slices tensors and performs
optimizer-state surgery on every rank (reference
models/vision_transformer.py:785-950, models/layers.py:218-338, 559-696,
883-992; optim.py:122-182). Here a prune event only rewrites the small
`ArchState` arrays plus (at convergence) the module's saliency score, so the
jitted train step never changes shape:

  event            reference action                   static equivalent
  ---------------  ---------------------------------  -------------------------
  cell kill        switch_cell=False, alpha zeroed    same (arrays in place)
  trailing trim    slice weights/scores to new max    hard_mask zeroed beyond
                   ratio (layers.py:295-334,646-692,  the new max ratio, in
                   955-988) + model-wide propagation  score-rank order
                   (vision_transformer.py:837-915)
  convergence      slice to final keep set; score :=  hard_mask = final keep
                   w_p*sigmoid(score)+(1-w_p)         set; score rewritten the
                   (layers.py:275,629,939)            same way, zero elsewhere
  moments          Adam moments re-init for score/    zero_adam_moments on the
                   alpha (initialize=True)            matching paths

Decision consensus: the reference all-reduce-averages alpha across ranks
before thresholding (layers.py:9-14, SURVEY §5.2). Under single-controller
JAX SPMD, replicated alphas are bitwise identical on every device/host, so
the same decisions fall out with no explicit collective.

All math runs host-side on numpy copies of the (tiny) alpha/score arrays
between jitted steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.search_space import (ArchState, AttnArch, AttnSpace, DimArch,
                                   DimSpace, SearchSpace)
from .optim import zero_adam_moments


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def _masked_softmax_np(alpha: np.ndarray, switch: np.ndarray) -> np.ndarray:
    a = np.where(switch, alpha.astype(np.float64), -np.inf).reshape(-1)
    a = a - a.max()
    e = np.exp(a)
    p = e / e.sum()
    return np.where(switch.reshape(-1), p, 0.0).reshape(alpha.shape)


@dataclass
class CellEvent:
    pruned: bool = False
    converged: bool = False
    new_switch: Optional[np.ndarray] = None
    new_alpha: Optional[np.ndarray] = None
    killed: int = 0


def _kill_cells(alpha: np.ndarray, switch: np.ndarray, thresh: float
                ) -> CellEvent:
    """Cell-kill decision (reference models/layers.py:224-243): softmax over
    active cells; kill every cell with prob <= thresh / n_active; alpha of
    killed cells is zeroed."""
    n_active = int(switch.sum())
    if n_active <= 1:
        return CellEvent()
    thr = thresh / n_active
    p_active = _masked_softmax_np(alpha, switch)
    p_min = p_active[switch].min()
    if p_min > thr:
        return CellEvent()
    new_switch = p_active > thr
    if new_switch.sum() == 0:          # numerical guard: keep the best cell
        best = np.unravel_index(np.argmax(p_active), p_active.shape)
        new_switch = np.zeros_like(switch)
        new_switch[best] = True
    new_alpha = np.where(new_switch, alpha, 0.0)
    return CellEvent(pruned=True, converged=int(new_switch.sum()) == 1,
                     new_switch=new_switch, new_alpha=new_alpha,
                     killed=n_active - int(new_switch.sum()))


def _topk_mask_1d(score: np.ndarray, hard: np.ndarray, k: int) -> np.ndarray:
    """0/1 mask keeping the top-k alive channels by score."""
    s = np.where(hard > 0, score.reshape(-1).astype(np.float64), -np.inf)
    keep = np.argsort(-s, kind="stable")[:k]
    m = np.zeros_like(hard)
    m[keep] = 1.0
    return m


def _compress_dim(alpha, switch, score, hard, w_p, thresh: float,
                  space: DimSpace) -> Dict[str, Any]:
    """1-D width compress (embed / MLP hidden). Returns a dict of updates:
    {switch, alpha, hard, finished, score (opt), zero_score_moments,
    zero_alpha_moments, pruned}."""
    ev = _kill_cells(alpha, switch, thresh)
    if not ev.pruned:
        return {"pruned": False}
    out: Dict[str, Any] = {"pruned": True, "switch": ev.new_switch,
                           "alpha": ev.new_alpha, "zero_alpha_moments": True,
                           "finished": ev.converged}
    sizes = space.cell_sizes
    new_max = int(sizes[ev.new_switch.reshape(-1)].max())
    cur_alive = int((hard > 0).sum())
    if ev.converged:
        keep = int(sizes[np.argmax(ev.new_switch.reshape(-1))])
        new_hard = _topk_mask_1d(score, hard, keep)
        sig = 1.0 / (1.0 + np.exp(-score.astype(np.float64)))
        new_score = (w_p * sig + (1.0 - w_p)) * new_hard
        out.update(hard=new_hard, score=new_score.astype(np.float32),
                   zero_score_moments=True)
    elif new_max < cur_alive:
        # trailing-cell trim (reference layers.py:295-334 / 955-988)
        out.update(hard=_topk_mask_1d(score, hard, new_max))
    return out


def _compress_attn(alpha, switch, score, hard, w_p, thresh: float,
                   space: AttnSpace) -> Dict[str, Any]:
    """Joint head x channel compress (reference models/layers.py:559-696)."""
    ev = _kill_cells(alpha, switch, thresh)
    if not ev.pruned:
        return {"pruned": False}
    out: Dict[str, Any] = {"pruned": True, "switch": ev.new_switch,
                           "alpha": ev.new_alpha, "zero_alpha_moments": True,
                           "finished": ev.converged}
    H, d = hard.shape
    rows = ev.new_switch.any(axis=1)
    cols = ev.new_switch.any(axis=0)
    head_cnt = int(space.head_list[int(np.where(rows)[0].max())])
    chan_cnt = int(space.chan_counts[int(np.where(cols)[0].max())])

    cur_heads = int((hard.sum(axis=1) > 0).sum())
    cur_chans = int(hard.sum(axis=1).max())
    need_trim = ev.converged or head_cnt < cur_heads or chan_cnt < cur_chans
    if need_trim:
        sb = np.broadcast_to(np.asarray(score, np.float64), (H, d))
        sig = 1.0 / (1.0 + np.exp(-sb))
        head_sal = (sig * hard).sum(axis=1)
        head_alive = hard.sum(axis=1) > 0
        hs = np.where(head_alive, head_sal, -np.inf)
        keep_heads = np.argsort(-hs, kind="stable")[:head_cnt]
        new_hard = np.zeros_like(hard)
        for h in keep_heads:
            s = np.where(hard[h] > 0, sb[h], -np.inf)
            keep_c = np.argsort(-s, kind="stable")[:chan_cnt]
            new_hard[h, keep_c] = 1.0
        out["hard"] = new_hard
        out["scale"] = float(chan_cnt) ** -0.5
        out["head_alive"] = head_cnt
        if ev.converged:
            score_np = np.asarray(score, np.float64)
            sig_s = 1.0 / (1.0 + np.exp(-score_np))
            # reduce hard to the stored score's (possibly broadcast) shape
            if score_np.shape == (H, d):
                hard_s = new_hard
            elif score_np.shape[0] == 1:       # channel-search (1, d)
                hard_s = new_hard[keep_heads[0]][None, :]
            else:                               # head-search (H, 1)
                hard_s = (new_hard.sum(axis=1, keepdims=True) > 0) * 1.0
            new_score = (w_p * sig_s + (1.0 - w_p)) * hard_s
            out.update(score=new_score.astype(np.float32),
                       zero_score_moments=True)
    return out


@dataclass
class CompressReport:
    execute_prune: bool = False
    finish_search: bool = False
    events: List[str] = None

    def __post_init__(self):
        if self.events is None:
            self.events = []


def compress(params, alphas, arch: ArchState, opt_state,
             space: SearchSpace, thresh: float = 0.2
             ) -> Tuple[Any, Any, ArchState, Any, CompressReport]:
    """Run one compression pass over every searchable dimension
    (reference engine.py:201-213 call site; thresh 0.2).

    Returns (params, alphas, arch, opt_state, report). Pure host-side; all
    devices see identical replicated inputs so every host makes identical
    decisions (SURVEY §5.2 invariant).
    """
    report = CompressReport()
    zero_paths: List[str] = []

    # Bulk device->host prefetch of every decision input. The naive
    # per-array reads below cost one relay round trip EACH (~3-5 ms idle,
    # much more with a busy pipeline) — ~100 trips per pass at DeiT-S
    # geometry, 3 passes/epoch. Two batched transfers replace them: the
    # (alphas, arch) trees, then the per-module score vectors (selected
    # using the host arch flags). Decisions run on host copies; only the
    # small updated arrays go back. Big tensors never move.
    alphas, arch = jax.device_get((alphas, arch))
    sc: Dict[Any, Any] = {}
    if space.embed.searchable and not bool(arch.embed.finished):
        sc["embed"] = params["patch_embed"]["score"]
    for _s, _ds in enumerate(space.stage_embeds):
        if _ds.searchable and not bool(arch.stage_embeds[_s].finished):
            sc[f"stage.{_s}"] = params["stages"][_s]["embed_score"]
    for _i, _bs in enumerate(space.blocks):
        _blk = _get_in(params, _block_path(params, _i))
        if _bs.attn.searchable and not bool(arch.blocks[_i].attn.finished):
            sc[f"attn.{_i}"] = _blk["attn"]["score"]
        if _bs.mlp.searchable and not bool(arch.blocks[_i].mlp.finished):
            sc[f"mlp.{_i}"] = _blk["mlp"]["score"]
    sc = jax.device_get(sc)

    new_alphas = dict(alphas)
    new_params = params
    arch_updates: Dict[str, Any] = {}

    # --- patch dimension (reference vision_transformer.py:789-821) -------
    pa = arch.patch
    if not bool(pa.finished):
        ev = _kill_cells(_np(alphas["patch"]), _np(pa.switch), thresh)
        if ev.pruned:
            report.execute_prune = True
            report.events.append(
                f"patch: killed {ev.killed} cells"
                + (" (converged)" if ev.converged else ""))
            new_alphas["patch"] = jnp.asarray(ev.new_alpha, jnp.float32)
            arch_updates["patch"] = pa.replace(
                switch=jnp.asarray(ev.new_switch),
                finished=jnp.asarray(ev.converged),
                pruned_once=jnp.asarray(True))
            zero_paths.append("1.patch")

    # --- embed dimension (reference layers.py:218-338 + model propagation
    #     vision_transformer.py:837-915, which the static hard mask covers) -
    ea = arch.embed
    if space.embed.searchable and not bool(ea.finished):
        upd = _compress_dim(_np(alphas["embed"]), _np(ea.switch),
                            _np(sc["embed"]),
                            _np(ea.hard_mask), float(ea.w_p), thresh,
                            space.embed)
        if upd["pruned"]:
            report.execute_prune = True
            report.events.append(
                "embed: prune event" + (" (converged)" if upd["finished"]
                                        else ""))
            new_alphas["embed"] = jnp.asarray(upd["alpha"], jnp.float32)
            rep = dict(switch=jnp.asarray(upd["switch"]),
                       finished=jnp.asarray(upd["finished"]))
            if "hard" in upd:
                rep["hard_mask"] = jnp.asarray(upd["hard"], jnp.float32)
            arch_updates["embed"] = ea.replace(**rep)
            zero_paths.append("1.embed")
            if "score" in upd:
                new_params = _set_in(new_params, ("patch_embed", "score"),
                                     jnp.asarray(upd["score"]))
                zero_paths.append("0.patch_embed.score")

    # --- per-stage embed widths (Swin; patch merging ties each stage's
    #     residual width — same 1-D machinery as the ViT embed, score at
    #     params["stages"][s]["embed_score"]) ------------------------------
    new_stage_embeds = list(arch.stage_embeds)
    for s, ds in enumerate(space.stage_embeds):
        ea = arch.stage_embeds[s]
        if not ds.searchable or bool(ea.finished):
            continue
        upd = _compress_dim(_np(alphas["stage_embeds"][s]), _np(ea.switch),
                            _np(sc[f"stage.{s}"]),
                            _np(ea.hard_mask), float(ea.w_p), thresh, ds)
        if upd["pruned"]:
            report.execute_prune = True
            report.events.append(
                f"stage{s}.embed: prune event"
                + (" (converged)" if upd["finished"] else ""))
            se = list(new_alphas.get("stage_embeds", alphas["stage_embeds"]))
            se[s] = jnp.asarray(upd["alpha"], jnp.float32)
            new_alphas["stage_embeds"] = se
            rep = dict(switch=jnp.asarray(upd["switch"]),
                       finished=jnp.asarray(upd["finished"]))
            if "hard" in upd:
                rep["hard_mask"] = jnp.asarray(upd["hard"], jnp.float32)
            new_stage_embeds[s] = ea.replace(**rep)
            zero_paths.append(f"1.stage_embeds.{s}")
            if "score" in upd:
                new_params = _set_in(new_params,
                                     ("stages", s, "embed_score"),
                                     jnp.asarray(upd["score"]))
                zero_paths.append(f"0.stages.{s}.embed_score")
    if new_stage_embeds:
        arch_updates["stage_embeds"] = tuple(new_stage_embeds)

    # --- per-block attn / mlp -------------------------------------------
    new_block_arches = list(arch.blocks)
    for i, bs in enumerate(space.blocks):
        ba = arch.blocks[i]
        blk_alphas = dict(new_alphas["blocks"][i]) if isinstance(
            new_alphas.get("blocks"), list) else dict(alphas["blocks"][i])
        if "blocks" not in arch_updates:
            pass
        changed = False

        bpath = _block_path(params, i)
        bpath_str = ".".join(str(x) for x in bpath)
        if bs.attn.searchable and not bool(ba.attn.finished):
            upd = _compress_attn(_np(alphas["blocks"][i]["attn"]),
                                 _np(ba.attn.switch),
                                 _np(sc[f"attn.{i}"]),
                                 _np(ba.attn.hard_mask), float(ba.attn.w_p),
                                 thresh, bs.attn)
            if upd["pruned"]:
                report.execute_prune = True
                report.events.append(
                    f"block{i}.attn: prune event"
                    + (" (converged)" if upd["finished"] else ""))
                blk_alphas["attn"] = jnp.asarray(upd["alpha"], jnp.float32)
                rep = dict(switch=jnp.asarray(upd["switch"]),
                           finished=jnp.asarray(upd["finished"]))
                if "hard" in upd:
                    rep["hard_mask"] = jnp.asarray(upd["hard"], jnp.float32)
                    rep["scale"] = jnp.asarray(upd["scale"], jnp.float32)
                    rep["head_alive"] = jnp.asarray(upd["head_alive"],
                                                    jnp.int32)
                new_block_arches[i] = new_block_arches[i].replace(
                    attn=ba.attn.replace(**rep))
                zero_paths.append(f"1.blocks.{i}.attn")
                if "score" in upd:
                    new_params = _set_in(
                        new_params, bpath + ("attn", "score"),
                        jnp.asarray(upd["score"]))
                    zero_paths.append(f"0.{bpath_str}.attn.score")
                changed = True

        ba = new_block_arches[i]
        if bs.mlp.searchable and not bool(ba.mlp.finished):
            upd = _compress_dim(_np(alphas["blocks"][i]["mlp"]),
                                _np(ba.mlp.switch),
                                _np(sc[f"mlp.{i}"]),
                                _np(ba.mlp.hard_mask), float(ba.mlp.w_p),
                                thresh, bs.mlp)
            if upd["pruned"]:
                report.execute_prune = True
                report.events.append(
                    f"block{i}.mlp: prune event"
                    + (" (converged)" if upd["finished"] else ""))
                blk_alphas["mlp"] = jnp.asarray(upd["alpha"], jnp.float32)
                rep = dict(switch=jnp.asarray(upd["switch"]),
                           finished=jnp.asarray(upd["finished"]))
                if "hard" in upd:
                    rep["hard_mask"] = jnp.asarray(upd["hard"], jnp.float32)
                new_block_arches[i] = new_block_arches[i].replace(
                    mlp=ba.mlp.replace(**rep))
                zero_paths.append(f"1.blocks.{i}.mlp")
                if "score" in upd:
                    new_params = _set_in(
                        new_params, bpath + ("mlp", "score"),
                        jnp.asarray(upd["score"]))
                    zero_paths.append(f"0.{bpath_str}.mlp.score")
                changed = True
        del ba

        if changed:
            blocks_list = list(new_alphas.get("blocks", alphas["blocks"]))
            blocks_list[i] = blk_alphas
            new_alphas["blocks"] = blocks_list

    new_arch = arch.replace(
        blocks=tuple(new_block_arches),
        **{k: v for k, v in arch_updates.items()})

    # convergence of already-single-cell modules with no event this pass
    # (reference layers.py:219-222: switch.sum()==1 -> finish immediately)
    new_arch = _finish_singletons(new_arch, space)
    report.finish_search = new_arch.all_finished

    # back to device arrays in one shot — leftover numpy leaves from the
    # bulk prefetch would otherwise re-upload on EVERY subsequent step
    # dispatch (jit converts fresh ndarray arguments each call)
    new_arch = jax.tree_util.tree_map(jnp.asarray, new_arch)
    new_alphas = jax.tree_util.tree_map(jnp.asarray, new_alphas)

    new_opt_state = opt_state
    if zero_paths and opt_state is not None:
        def pred(path: str) -> bool:
            return any(path.startswith(z) for z in zero_paths)
        new_opt_state = zero_adam_moments(opt_state, pred)

    return new_params, new_alphas, new_arch, new_opt_state, report


def _finish_singletons(arch: ArchState, space: SearchSpace) -> ArchState:
    """Modules whose switch has a single active cell are finished even
    without a fresh prune event (reference layers.py:219-222, 560-563,
    884-887). Note convergence *with* score transform only happens through
    a prune event; a module born with one cell uses its identity score."""
    def fin_dim(d: DimArch) -> DimArch:
        if bool(d.finished) or int(_np(d.switch).sum()) != 1:
            return d
        return d.replace(finished=jnp.asarray(True))

    def fin_attn(a: AttnArch) -> AttnArch:
        if bool(a.finished) or int(_np(a.switch).sum()) != 1:
            return a
        return a.replace(finished=jnp.asarray(True))

    pa = arch.patch
    if not bool(pa.finished) and int(_np(pa.switch).sum()) == 1:
        pa = pa.replace(finished=jnp.asarray(True))
    return arch.replace(
        embed=fin_dim(arch.embed),
        blocks=tuple(b.replace(attn=fin_attn(b.attn), mlp=fin_dim(b.mlp))
                     for b in arch.blocks),
        patch=pa,
        stage_embeds=tuple(fin_dim(d) for d in arch.stage_embeds))


def _block_path(params, i: int) -> Tuple:
    """Path of the i-th transformer block in the params tree. Supports the
    ViT layout (params["blocks"][i]) and the Swin layout
    (params["stages"][s]["blocks"][b] with blocks flattened across
    stages)."""
    if "blocks" in params:
        return ("blocks", i)
    j = i
    for s, stage in enumerate(params["stages"]):
        nb = len(stage["blocks"])
        if j < nb:
            return ("stages", s, "blocks", j)
        j -= nb
    raise IndexError(i)


def _get_in(tree, path: Tuple):
    for p in path:
        tree = tree[p]
    return tree


def _set_in(tree, path: Tuple, value):
    """Immutable nested set for dict/list pytrees."""
    if len(path) == 0:
        return value
    head, rest = path[0], path[1:]
    if isinstance(tree, dict):
        out = dict(tree)
        out[head] = _set_in(tree[head], rest, value)
        return out
    if isinstance(tree, (list, tuple)):
        out = list(tree)
        out[head] = _set_in(tree[head], rest, value)
        return out if isinstance(tree, list) else tuple(out)
    raise TypeError(f"cannot set path {path} in {type(tree)}")


def decompress(arch: ArchState) -> ArchState:
    """Re-open the search: clear `finished` on every module whose switch
    still has multiple options (reference models/layers.py:340-343,
    730-733, 1027-1030 `decompress`). Hard masks are NOT restored — the
    reference physically discarded those weights; we keep the same
    semantics."""
    def open_dim(d: DimArch) -> DimArch:
        if int(_np(d.switch).sum()) > 1:
            return d.replace(finished=jnp.asarray(False))
        return d

    def open_attn(a: AttnArch) -> AttnArch:
        if int(_np(a.switch).sum()) > 1:
            return a.replace(finished=jnp.asarray(False))
        return a

    pa = arch.patch
    if int(_np(pa.switch).sum()) > 1:
        pa = pa.replace(finished=jnp.asarray(False))
    return arch.replace(
        embed=open_dim(arch.embed),
        blocks=tuple(b.replace(attn=open_attn(b.attn), mlp=open_dim(b.mlp))
                     for b in arch.blocks),
        patch=pa)


@jax.jit
def _update_w_p_device(arch: ArchState, val: jnp.ndarray) -> ArchState:
    """One fused device program, no host readbacks: finished modules keep
    their last w_p via jnp.where (this runs EVERY iteration of the hot
    loop — the per-module `bool(finished)` branch it replaces cost a
    blocking device->host round-trip per module per iteration, ~150 ms on
    the TPU relay)."""
    def upd(m):
        return m.replace(w_p=jnp.where(m.finished, m.w_p, val))
    return arch.replace(
        embed=upd(arch.embed),
        blocks=tuple(b.replace(attn=upd(b.attn), mlp=upd(b.mlp))
                     for b in arch.blocks),
        stage_embeds=tuple(upd(d) for d in arch.stage_embeds))


def sync_w_p(arch: ArchState, frac_epoch: float,
             warmup_epochs: float) -> ArchState:
    """Set every unfinished module's w_p to the CLAMPED schedule value —
    the host-side mirror of the in-jit anneal in
    steps.make_planned_search_step (same `w_p_schedule` formula), used by
    the planned epoch loop to keep ArchState.w_p in step with what the
    device program last applied before compress/eval/checkpoint."""
    from .steps import w_p_schedule
    return _update_w_p_device(arch, w_p_schedule(frac_epoch, warmup_epochs))


def update_w_p(arch: ArchState, frac_epoch: float, warmup_epochs: float,
               w_max: float = 0.99, w_min: float = 0.1) -> ArchState:
    """Anneal w_p for every *unfinished* module (reference engine.py:110-117
    + layers.py update_w: only called while cur_epoch <= warmup and module
    unfinished; finished modules keep their last w_p)."""
    if frac_epoch > warmup_epochs:
        return arch
    val = jnp.asarray(
        w_max + (w_min - w_max) * (frac_epoch / max(warmup_epochs, 1e-8)),
        jnp.float32)
    return _update_w_p_device(arch, val)
