"""Sin-cos position embeddings for the InternVideo2 ViT.

Numpy reimplementation of the published MAE-style 3D sincos tables the
reference uses (reference: third_party/.../internvideo2/pos_embed.py:12-64):
embed_dim splits 1/4 temporal + 3/4 spatial; [T, H, W] order; optional cls
row of zeros. Also the temporal interpolation used when loading an f4
checkpoint at n_frames=8 (pos_embed.py:185-298).
"""

from __future__ import annotations

import numpy as np


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_1d_sincos_pos_embed(embed_dim: int, t_size: int, cls_token: bool = False) -> np.ndarray:
    emb = _sincos_1d(embed_dim, np.arange(t_size, dtype=np.float32))
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb.astype(np.float32)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w first
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    emb = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb.astype(np.float32)


def get_3d_sincos_pos_embed(embed_dim: int, grid_size: int, t_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """[T*H*W(+1), D]; D/4 temporal + 3D/4 spatial, [T, H, W] order."""
    assert embed_dim % 4 == 0
    dim_spatial = embed_dim // 4 * 3
    dim_temporal = embed_dim // 4

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = _sincos_1d(dim_spatial // 2, grid[0])
    emb_w = _sincos_1d(dim_spatial // 2, grid[1])
    pos_spatial = np.concatenate([emb_h, emb_w], axis=1)  # [H*W, 3D/4]

    pos_temporal = _sincos_1d(dim_temporal, np.arange(t_size, dtype=np.float32))  # [T, D/4]

    pos_temporal = np.repeat(pos_temporal[:, np.newaxis, :], grid_size**2, axis=1)
    pos_spatial = np.repeat(pos_spatial[np.newaxis, :, :], t_size, axis=0)
    pos = np.concatenate([pos_temporal, pos_spatial], axis=-1).reshape([-1, embed_dim])
    if cls_token:
        pos = np.concatenate([np.zeros([1, embed_dim]), pos], axis=0)
    return pos.astype(np.float32)


def interpolate_temporal_pos_embed(pos_embed: np.ndarray, src_t: int, dst_t: int,
                                   num_spatial: int, has_cls: bool = True) -> np.ndarray:
    """Linearly interpolate a [1+src_t*S, D] pos table along time to dst_t
    (reference: interpolate_pos_embed_internvideo2, pos_embed.py:185-298).
    Used when loading the published f4 checkpoint at n_frames=8."""
    pos_embed = np.asarray(pos_embed)
    if has_cls:
        cls_tok, grid = pos_embed[:1], pos_embed[1:]
    else:
        cls_tok, grid = pos_embed[:0], pos_embed
    d = grid.shape[-1]
    grid = grid.reshape(src_t, num_spatial, d)
    # torch F.interpolate(mode='linear', align_corners=False) semantics
    # (half-pixel source coordinates, edge-clamped) — the reference applies
    # exactly this along time (pos_embed.py:205-215)
    x = (np.arange(dst_t, dtype=np.float64) + 0.5) * (src_t / dst_t) - 0.5
    x = np.clip(x, 0.0, src_t - 1.0)
    lo = np.floor(x).astype(np.int64)
    hi = np.minimum(lo + 1, src_t - 1)
    w = (x - lo).astype(grid.dtype)[:, None, None]
    out = grid[lo] * (1.0 - w) + grid[hi] * w
    out = out.reshape(dst_t * num_spatial, d)
    return np.concatenate([cls_tok, out], axis=0).astype(pos_embed.dtype)
