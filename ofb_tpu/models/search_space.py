"""Search-space definition: ratio grids, mask banks, and arch state.

The reference attaches per-module search state to nn.Modules
(reference models/layers.py: `alpha`, `switch_cell`, `mask`, `score`, `w_p`,
`finish_search`) and physically mutates tensor shapes at prune events.
Here the search space splits into:

  * a **static spec** (`SearchSpace`) — ratio grids, 0/1 mask banks and
    per-cell size counts, built once from the model config.  These are
    numpy constants closed over by the jitted step (never traced).
  * a **dynamic arch state** (`ArchState`) — small JAX arrays updated
    host-side at compress events: boolean `switch` cells, float `hard_mask`
    (1 = dimension still in play), `finished` flags, the entanglement
    weight `w_p`, and the attention softmax scale.

Trainable tensors (`alpha` per module, `score` per module) live in the
parameter pytrees (alphas tree / params tree), not here.

Static-gate equivalence to the reference's physical pruning:
  - killing a cell        -> switch[j] = False  (softmax -inf trick)
  - trailing-cell trim    -> hard_mask zeroed beyond the new max ratio,
                             in score-rank order  (reference slices weights,
                             layers.py:295-334, 646-692, 955-988)
  - convergence           -> finished=True, score transformed in place
                             (core/compress.py), forward gates by score only
                             (reference layers.py:196-197, 518-528, 859-860)
Physical slicing is deferred to export (core/export.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# Ratio grids — exact integer grids of the reference.
# ---------------------------------------------------------------------------

def embed_ratio_grid(embed_dim: int) -> Tuple[float, ...]:
    """Patch-embed width grid (reference models/layers.py:143-146):
    ratios i/D for i in range(D//2, D+1, min(D//32, 12))."""
    step = max(min(embed_dim // 32, 12), 1)
    return tuple(i / embed_dim for i in range(embed_dim // 2, embed_dim + 1, step))


def head_num_grid(num_heads: int) -> Tuple[int, ...]:
    """Attention head-count grid (reference models/layers.py:425,450):
    range(2, H+1, 2)."""
    return tuple(range(2, num_heads + 1, 2))


def qkv_channel_grid(head_dim: int) -> Tuple[float, ...]:
    """Per-head QKV channel grid (reference models/layers.py:436-439):
    ratios i/d for i in range(d//4, d+1, max(d//8, 1))."""
    step = max(head_dim // 8, 1)
    return tuple(i / head_dim for i in range(head_dim // 4, head_dim + 1, step))


def mlp_hidden_grid(hidden: int) -> Tuple[float, ...]:
    """MLP hidden-width grid (reference models/layers.py:813-816):
    ratios i/h for i in range(h//4, h+1, h//8)."""
    step = hidden // 8
    return tuple(i / hidden for i in range(hidden // 4, hidden + 1, step))


def patch_ratio_grid() -> Tuple[float, ...]:
    """Token-keep ratio grid (reference models/vision_transformer.py:471):
    linspace(0.5, 1.0, 5)."""
    return tuple(np.linspace(0.5, 1.0, 5).tolist())


# ---------------------------------------------------------------------------
# Static per-dimension spaces (mask banks live in the *sorted domain*: cell j
# covers ranks [0, size_j); the rank-restore gather maps them back to
# original channel order by saliency score).
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DimSpace:
    """1-D searchable width (patch-embed channels or MLP hidden units)."""

    dim: int
    ratios: Tuple[float, ...]
    searchable: bool = True

    @property
    def num_cells(self) -> int:
        return len(self.ratios)

    @property
    def cell_sizes(self) -> np.ndarray:
        """Active-unit count per cell: int(r * dim)."""
        return np.array([int(r * self.dim) for r in self.ratios], np.float32)

    @property
    def mask_bank(self) -> np.ndarray:
        """(K, dim) prefix masks in the sorted domain
        (reference models/layers.py:150-153, 819-822)."""
        bank = np.zeros((self.num_cells, self.dim), np.float32)
        for i, r in enumerate(self.ratios):
            bank[i, : int(r * self.dim)] = 1.0
        return bank


@dataclass(frozen=True)
class AttnSpace:
    """Joint head-count x per-head-channel space
    (reference models/layers.py:449-466; head-only / channel-only variants
    per layers.py:424-448)."""

    num_heads: int
    head_dim: int
    head_list: Tuple[int, ...]          # candidate head counts
    chan_ratios: Tuple[float, ...]      # candidate per-head channel ratios
    searchable: bool = True

    @staticmethod
    def build(num_heads: int, head_dim: int, head_search: bool = False,
              channel_search: bool = False, searchable: bool = True
              ) -> "AttnSpace":
        if not searchable:
            return AttnSpace(num_heads, head_dim, (num_heads,), (1.0,), False)
        if head_search:
            return AttnSpace(num_heads, head_dim, head_num_grid(num_heads),
                             (1.0,), True)
        if channel_search:
            return AttnSpace(num_heads, head_dim, (num_heads,),
                             qkv_channel_grid(head_dim), True)
        return AttnSpace(num_heads, head_dim, head_num_grid(num_heads),
                         qkv_channel_grid(head_dim), True)

    @property
    def num_cells(self) -> Tuple[int, int]:
        return (len(self.head_list), len(self.chan_ratios))

    @property
    def chan_counts(self) -> Tuple[int, ...]:
        return tuple(int(r * self.head_dim) for r in self.chan_ratios)

    @property
    def cell_sizes(self) -> np.ndarray:
        """(Kh, Kc) total active qkv units per cell = heads_i * chans_j.
        Equals mask[i,:,j,:].sum(), the quantity entering the FLOPs model
        (reference models/layers.py:753 weighted_mask.sum())."""
        h = np.array(self.head_list, np.float32)[:, None]
        c = np.array(self.chan_counts, np.float32)[None, :]
        return h * c

    @property
    def mask_bank(self) -> np.ndarray:
        """(Kh, H, Kc, d) joint masks (reference models/layers.py:458-462)."""
        kh, kc = self.num_cells
        bank = np.zeros((kh, self.num_heads, kc, self.head_dim), np.float32)
        for i, n in enumerate(self.head_list):
            for j, cnt in enumerate(self.chan_counts):
                bank[i, :n, j, :cnt] = 1.0
        return bank


@dataclass(frozen=True)
class PatchSpace:
    """Token-count space (reference models/vision_transformer.py:469-485)."""

    num_patches: int
    ratios: Tuple[float, ...]
    searchable: bool = True

    @property
    def num_cells(self) -> int:
        return len(self.ratios)

    @property
    def cell_sizes(self) -> np.ndarray:
        return np.array([int(r * self.num_patches) for r in self.ratios],
                        np.float32)


@dataclass(frozen=True)
class BlockSpace:
    attn: AttnSpace
    mlp: DimSpace


@dataclass(frozen=True)
class SearchSpace:
    """Whole-model static search space.

    stage_embeds: per-stage residual-width spaces for hierarchical models
    (Swin) where patch merging ties widths across stages — empty for ViT,
    whose single width lives in `embed`."""

    embed: DimSpace
    blocks: Tuple[BlockSpace, ...]
    patch: PatchSpace
    stage_embeds: Tuple[DimSpace, ...] = ()

    @staticmethod
    def build(embed_dim: int, depth: int, num_heads: int, mlp_hidden: int,
              num_patches: int, *, attn_search=True, mlp_search=True,
              embed_search=True, patch_search=True, head_search=False,
              channel_search=False, mask_ratio: float = 1.0) -> "SearchSpace":
        head_dim = embed_dim // num_heads
        embed = DimSpace(embed_dim,
                         embed_ratio_grid(embed_dim) if embed_search else (1.0,),
                         embed_search)
        blocks = tuple(
            BlockSpace(
                attn=AttnSpace.build(num_heads, head_dim, head_search,
                                     channel_search, attn_search),
                mlp=DimSpace(mlp_hidden,
                             mlp_hidden_grid(mlp_hidden) if mlp_search else (1.0,),
                             mlp_search),
            )
            for _ in range(depth)
        )
        patch = PatchSpace(num_patches,
                           patch_ratio_grid() if patch_search else (mask_ratio,),
                           patch_search)
        return SearchSpace(embed=embed, blocks=blocks, patch=patch)


# ---------------------------------------------------------------------------
# Dynamic arch state (a pytree; small arrays, updated host-side by
# core/compress.py between jitted steps).
# ---------------------------------------------------------------------------

@struct.dataclass
class DimArch:
    """State for a 1-D searchable width."""

    switch: jnp.ndarray          # bool (K,)   active cells
    hard_mask: jnp.ndarray       # f32 (dim,)  1 = channel still in play
    finished: jnp.ndarray        # bool scalar
    w_p: jnp.ndarray             # f32 scalar, annealed 0.99 -> 0.1

    @staticmethod
    def create(space: DimSpace) -> "DimArch":
        return DimArch(
            switch=jnp.ones((space.num_cells,), bool),
            hard_mask=jnp.ones((space.dim,), jnp.float32),
            finished=jnp.asarray(not space.searchable),
            w_p=jnp.asarray(0.99, jnp.float32),
        )


@struct.dataclass
class AttnArch:
    switch: jnp.ndarray          # bool (Kh, Kc)
    hard_mask: jnp.ndarray       # f32 (H, d)
    finished: jnp.ndarray        # bool scalar
    w_p: jnp.ndarray             # f32 scalar
    scale: jnp.ndarray           # f32 scalar attention softmax scale;
                                 # updated at prune events
                                 # (reference models/layers.py:611,663)
    head_alive: jnp.ndarray      # i32 scalar count of heads in play

    @staticmethod
    def create(space: AttnSpace) -> "AttnArch":
        kh, kc = space.num_cells
        return AttnArch(
            switch=jnp.ones((kh, kc), bool),
            hard_mask=jnp.ones((space.num_heads, space.head_dim), jnp.float32),
            finished=jnp.asarray(not space.searchable),
            w_p=jnp.asarray(0.99, jnp.float32),
            scale=jnp.asarray(space.head_dim ** -0.5, jnp.float32),
            head_alive=jnp.asarray(space.num_heads, jnp.int32),
        )


@struct.dataclass
class BlockArch:
    attn: AttnArch
    mlp: DimArch


@struct.dataclass
class PatchArch:
    switch: jnp.ndarray          # bool (Kp,)
    finished: jnp.ndarray        # bool scalar
    pruned_once: jnp.ndarray     # bool scalar: the patch weighted-mask enters
                                 # the FLOPs model only after the first patch
                                 # prune event (reference
                                 # models/vision_transformer.py:768,813)

    @staticmethod
    def create(space: PatchSpace) -> "PatchArch":
        return PatchArch(
            switch=jnp.ones((space.num_cells,), bool),
            finished=jnp.asarray(not space.searchable),
            pruned_once=jnp.asarray(False),
        )


@struct.dataclass
class ArchState:
    embed: DimArch
    blocks: Tuple[BlockArch, ...]
    patch: PatchArch
    fused: jnp.ndarray           # bool scalar — scores folded into weights
    stage_embeds: Tuple[DimArch, ...] = ()   # per-stage widths (Swin)

    @staticmethod
    def create(space: SearchSpace) -> "ArchState":
        return ArchState(
            embed=DimArch.create(space.embed),
            blocks=tuple(
                BlockArch(attn=AttnArch.create(b.attn),
                          mlp=DimArch.create(b.mlp))
                for b in space.blocks
            ),
            patch=PatchArch.create(space.patch),
            fused=jnp.asarray(False),
            stage_embeds=tuple(DimArch.create(d)
                               for d in space.stage_embeds),
        )

    @property
    def all_finished(self) -> bool:
        """finish_search of the whole model (host-side check)."""
        done = bool(self.embed.finished) and bool(self.patch.finished)
        for d in self.stage_embeds:
            done = done and bool(d.finished)
        for b in self.blocks:
            done = done and bool(b.attn.finished) and bool(b.mlp.finished)
        return done
