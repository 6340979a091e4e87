"""Minimal space types (gym is not a dependency of this framework)."""

from __future__ import annotations

import numpy as np


class BoxSpace:
    def __init__(self, low, high, shape=None, dtype=np.float32, discrete=False):
        if shape is None:
            shape = np.broadcast(np.asarray(low), np.asarray(high)).shape
        self.shape = tuple(shape)
        self.low = np.broadcast_to(np.asarray(low, dtype), self.shape)
        self.high = np.broadcast_to(np.asarray(high, dtype), self.shape)
        self.dtype = np.dtype(dtype)
        self.discrete = discrete
        self._rng = np.random.default_rng()

    def seed(self, seed):
        self._rng = np.random.default_rng(seed)

    def sample(self):
        if self.discrete:
            out = np.zeros(self.shape, self.dtype)
            out[self._rng.integers(0, self.shape[0])] = 1
            return out
        low = np.where(np.isfinite(self.low), self.low, -1.0)
        high = np.where(np.isfinite(self.high), self.high, 1.0)
        return self._rng.uniform(low, high).astype(self.dtype)

    def __repr__(self):
        return f"BoxSpace(shape={self.shape}, dtype={self.dtype})"
