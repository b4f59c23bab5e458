"""Positional-embedding utilities.

Equivalents of reference models/pos_embed.py:20-96 (2-D sin-cos generators +
checkpoint pos-embed interpolation) and the timm-style resize used at model
load (reference models/vision_transformer.py:988-1005, finetune.py:331-349).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray
                                      ) -> np.ndarray:
    """(M,) positions -> (M, D) sin-cos embedding."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False,
                            num_extra_tokens: int = 1) -> np.ndarray:
    """(grid*grid [+extra], D) 2-D sin-cos table
    (reference models/pos_embed.py:20-45)."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)          # w goes first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos = np.concatenate(
            [np.zeros([num_extra_tokens, embed_dim]), pos], axis=0)
    return pos.astype(np.float32)


def interpolate_pos_embed(pos_embed: jnp.ndarray, new_num_patches: int,
                          num_extra_tokens: int = 1) -> jnp.ndarray:
    """Bicubic grid resize of a (1, T+N, D) pos-embed table to a new patch
    count (reference models/pos_embed.py:75-96, finetune.py:331-349)."""
    tokens = pos_embed[:, :num_extra_tokens]
    grid_tok = pos_embed[:, num_extra_tokens:]
    n_old = grid_tok.shape[1]
    g_old = int(round(float(np.sqrt(n_old))))
    g_new = int(round(float(np.sqrt(new_num_patches))))
    if g_old == g_new:
        return pos_embed
    D = grid_tok.shape[-1]
    grid = grid_tok.reshape(1, g_old, g_old, D)
    resized = jax.image.resize(grid, (1, g_new, g_new, D), method="bicubic")
    return jnp.concatenate([tokens, resized.reshape(1, g_new * g_new, D)],
                           axis=1)
