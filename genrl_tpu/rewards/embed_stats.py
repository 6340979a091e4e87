"""Embedding-space whitening for the video/text prompt pipeline.

Why this exists. The GenRL objective conditions the connector on video-CLIP
embeddings and aligns imagined latents to a connector target generated from a
prompt embedding (reference: tools/genrl_utils.py:279-409). That machinery
assumes the embedding space is *spread*: distinct behaviors map to distinct
directions. An embedder whose outputs cluster around a dominant direction —
measured here for a randomly-initialized InternVideo2, whose unit-norm
embeddings have pairwise cosine ~0.996 across behaviorally opposite episodes
— starves the connector of conditioning signal: every prompt generates the
same (dataset-modal) latent trajectory, and the alignment reward becomes
behavior-agnostic.

The fix is classical retrieval-space hygiene: remove the dataset mean and
renormalize to the unit sphere. The residual directions carry the
discriminative signal (on the round-2 stickman dataset the mean-removed
projection correlates 0.67 with episode return while raw cosines are
indistinguishable). Whitening is a *consistent reparameterization*: the same
statistics are applied to every stored `clip_video` sequence (connector
training input) and to the prompt embedding (target generation input), so the
connector's conditioning distribution and the prompt live in the same space.

Gated by the `embed_whiten` config flag (default off — with a published
InternVideo2 checkpoint the space is already spread and the reference
semantics are untouched). Stats are persisted as `embed_stats.npz` next to
the snapshots so a behavior-learning or data-free run reuses the exact
pretrain statistics.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

STATS_FILENAME = "embed_stats.npz"


def compute_embed_mean(seqs, norms_floor: float = 1e-6) -> np.ndarray:
    """Mean embedding over an iterable of [T, E] float arrays.

    Frames whose embedding norm is ~0 (zero-padded rows from episodes whose
    head windows were never embedded) are excluded from the statistic.
    """
    total = None
    count = 0
    for seq in seqs:
        seq = np.asarray(seq, np.float64)
        valid = np.linalg.norm(seq, axis=-1) > norms_floor
        if not valid.any():
            continue
        s = seq[valid]
        total = s.sum(0) if total is None else total + s.sum(0)
        count += s.shape[0]
    if count == 0:
        raise ValueError("no valid embedding rows to compute stats over")
    return (total / count).astype(np.float32)


def whiten(x: np.ndarray, mean: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Mean-center and renormalize to the unit sphere along the last axis.

    Zero rows (padding) stay zero so padded episode tails keep their
    sentinel value.
    """
    x = np.asarray(x, np.float32)
    zero = np.linalg.norm(x, axis=-1, keepdims=True) <= eps
    r = x - np.asarray(mean, np.float32)
    r = r / np.maximum(np.linalg.norm(r, axis=-1, keepdims=True), eps)
    return np.where(zero, 0.0, r)


def save_stats(directory: Path, mean: np.ndarray) -> Path:
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / STATS_FILENAME
    np.savez(path, mean=np.asarray(mean, np.float32))
    return path


def load_stats(directory: Path) -> Dict[str, np.ndarray]:
    path = Path(directory) / STATS_FILENAME
    with np.load(path) as f:
        return {"mean": f["mean"]}
