"""Schedule predicates, timers and misc host-side helpers
(reference: tools/utils.py:61-99, 172-189)."""

from __future__ import annotations

import random
import time

import numpy as np


class Until:
    """True while step < until (in action-repeat-scaled frames)."""

    def __init__(self, until, action_repeat: int = 1):
        self._until = until
        self._action_repeat = action_repeat

    def __call__(self, step: int) -> bool:
        if self._until is None:
            return True
        return step < (self._until // self._action_repeat)


class Every:
    """True every `every` frames (scaled by action_repeat)."""

    def __init__(self, every, action_repeat: int = 1):
        self._every = every
        self._action_repeat = action_repeat

    def __call__(self, step: int) -> bool:
        if self._every is None or self._every == 0:
            return False
        return step % (self._every // self._action_repeat) == 0


class Crossed:
    """True once whenever the counter crosses a multiple of `every`.

    Every() fires on exact multiples, which the batched collector can step
    over (global_step advances by num_collect_envs per lockstep iteration);
    Crossed fires on the first call at-or-past each boundary instead."""

    def __init__(self, every, action_repeat: int = 1):
        self._every = (every // action_repeat) if every else 0
        self._last = None

    def __call__(self, step: int) -> bool:
        if not self._every:
            return False
        if self._last is None:
            self._last = step
            return False
        fired = step // self._every > self._last // self._every
        self._last = step
        return fired


class Timer:
    def __init__(self):
        self._start_time = time.time()
        self._last_time = time.time()

    def reset(self):
        elapsed = time.time() - self._last_time
        self._last_time = time.time()
        return elapsed, time.time() - self._start_time

    def total_time(self):
        return time.time() - self._start_time


def set_seed_everywhere(seed: int):
    np.random.seed(seed)
    random.seed(seed)


def retry(fn, attempts: int = 1000):
    """Retry a callable on transient filesystem errors
    (reference: tools/utils.py:172-189)."""

    def wrapped(*args, **kwargs):
        for i in range(attempts):
            try:
                return fn(*args, **kwargs)
            except (OSError, PermissionError) as e:
                if i == attempts - 1:
                    raise
                time.sleep(0.01)

    return wrapped


def slerp(p0, p1, t):
    """Spherical interpolation between two vectors (reference: tools/utils.py)."""
    p0, p1 = np.asarray(p0), np.asarray(p1)
    omega = np.arccos(
        np.clip(np.dot(p0 / np.linalg.norm(p0), p1 / np.linalg.norm(p1)), -1, 1))
    so = np.sin(omega)
    if so == 0:
        return (1.0 - t) * p0 + t * p1
    return np.sin((1.0 - t) * omega) / so * p0 + np.sin(t * omega) / so * p1


def flatten_dict(d, parent_key: str = "", sep: str = "/"):
    items = []
    for k, v in d.items():
        key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, dict):
            items.extend(flatten_dict(v, key, sep).items())
        else:
            items.append((key, v))
    return dict(items)
