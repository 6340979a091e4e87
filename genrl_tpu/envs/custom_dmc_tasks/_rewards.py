"""Declarative pose-reward primitives shared by the custom domains.

The reference implements every goal as a bespoke method over
dm_control.utils.rewards.tolerance calls (envs/custom_dmc_tasks/*.py). Here
the same shaping terms are factored into a tiny combinator vocabulary so each
task is a one-line composition; the numeric bounds/margins ARE the task
specification and are kept identical to the reference for score parity.
"""

from __future__ import annotations

import numpy as np
from dm_control.utils import rewards

INF = float("inf")


def above(value, h, margin=None, at_margin=0.1, sigmoid="gaussian"):
    """1 when value >= h, rolling off over `margin` (default h/2)."""
    return rewards.tolerance(value, bounds=(h, INF),
                             margin=h / 2 if margin is None else margin,
                             value_at_margin=at_margin, sigmoid=sigmoid)


def below(value, h, margin=None):
    """1 when value <= h, rolling off over `margin` (default 1.5*h)."""
    return rewards.tolerance(value, bounds=(-INF, h),
                             margin=h * 1.5 if margin is None else margin)


def speed_at_least(value, target, at_margin=0.5, margin=None):
    """Linear move-reward: 1 above `target` (margin default target/2)."""
    return rewards.tolerance(value, bounds=(target, INF),
                             margin=abs(target) / 2 if margin is None else margin,
                             value_at_margin=at_margin, sigmoid="linear")


def z(physics, body):
    return physics.named.data.xpos[body, "z"]


def x(physics, body):
    return physics.named.data.xpos[body, "x"]


def zz(physics, body):
    """World-z projection of the body z-axis (uprightness)."""
    return physics.named.data.xmat[body, "zz"]


def mean_z(physics, bodies):
    return float(np.mean([z(physics, b) for b in bodies]))


def upright01(physics, body="torso"):
    return (1 + zz(physics, body)) / 2


def horizontal01(physics, body="torso"):
    return 1 - abs(zz(physics, body))


def wmean(*pairs):
    """Weighted mean: wmean((w1, r1), (w2, r2), ...)."""
    total_w = sum(w for w, _ in pairs)
    return sum(w * r for w, r in pairs) / total_w
