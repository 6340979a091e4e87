"""Walker domain extensions (14 extra tasks on the planar walker).

Rebuild of envs/custom_dmc_tasks/walker.py:1-488 (MJCF walker.xml carried
over as a data asset). Reward shaping reuses the shared primitives; bounds
match the reference for score parity. Body names: torso, {left,right}_thigh,
{left,right}_leg, {left,right}_foot.
"""

from __future__ import annotations

import os

import numpy as np
from dm_control.rl import control
from dm_control.suite import common, walker
from dm_control.utils import io as resources

from genrl_tpu.envs.custom_dmc_tasks import _rewards as R

_YOGA_STAND_HEIGHT = 1.0
_YOGA_LIE_DOWN_HEIGHT = 0.1
_YOGA_LEGS_UP_HEIGHT = 1.1
_YOGA_FEET_UP_HEIGHT = 0.5
_YOGA_FEET_UP_LIE_DOWN_HEIGHT = 0.35
_YOGA_KNEE_HEIGHT = 0.25
_YOGA_KNEESTAND_HEIGHT = 0.75
_YOGA_SITTING_HEIGHT = 0.55
_YOGA_SITTING_LEGS_HEIGHT = 0.15
_SPIN_SPEED = 5.0


class WalkerYogaPoses:
    """Joint configurations for pose visualizations (walker.py:31-54)."""

    lie_back = [-1.2, 0.0, -1.57, 0, 0.0, 0.0, 0, -0.0, 0.0]
    lie_front = [-1.2, -0, 1.57, 0, -0.2, 0, 0, -0.2, 0.0]
    legs_up = [-1.24, 0.0, -1.57, 1.57, 0.0, 0.0, 1.57, -0.0, 0.0]
    kneel = [-0.5, 0.0, 0, 0, -1.57, -0.8, 1.57, -1.57, 0.0]
    side_angle = [-0.3, 0.0, 0.9, 0, 0, -0.7, 1.87, -1.07, 0.0]
    stand_up = [-0.15, 0.0, 0.34, 0.74, -1.34, -0.0, 1.1, -0.66, -0.1]
    lean_back = [-0.27, 0.0, -0.45, 0.22, -1.5, 0.86, 0.6, -0.8, -0.4]
    boat = [-1.04, 0.0, -0.8, 1.6, 0.0, 0.0, 1.6, -0.0, 0.0]
    bridge = [-1.1, 0.0, -2.2, -0.3, -1.5, 0.0, -0.3, -0.8, -0.4]
    head_stand = [-1, 0.0, -3, 0.6, -1, -0.3, 0.9, -0.5, 0.3]
    one_foot = [-0.2, 0.0, 0, 0.7, -1.34, 0.5, 1.5, -0.6, 0.1]
    arabesque = [-0.34, 0.0, 1.57, 1.57, 0, 0.0, 0, -0.0, 0.0]
    high_kick = [-0.165, 3.3, 5.55, 1.35, -0, +0.5, -0.7, 0.0, 0.2]
    splits = [-0.7, 0.0, 0.5, -0.7, -1.0, 0, 1.75, 0.0, -0.45]


def get_model_and_assets():
    xml = resources.GetResource(os.path.join(os.path.dirname(__file__), "walker.xml"))
    return xml, common.ASSETS


def _stand(p):
    return R.wmean((3, R.above(p.torso_height(), _YOGA_STAND_HEIGHT)),
                   (1, (1 + p.torso_upright()) / 2))


def _backwards(p, move_speed):
    if move_speed == 0:
        return _stand(p)
    move = R.speed_at_least(-p.horizontal_velocity(), move_speed,
                            margin=move_speed / 2)
    return _stand(p) * (5 * move + 1) / 6


def _arabesque(p):
    lz, rz = R.z(p, "left_foot"), R.z(p, "right_foot")
    hi, lo = ("right_foot", "left_foot") if rz > lz else ("left_foot", "right_foot")
    feet = R.wmean((1, R.below(R.z(p, lo), _YOGA_LIE_DOWN_HEIGHT)),
                   (2, R.above(R.z(p, hi), _YOGA_STAND_HEIGHT)))
    correct = 0.1 if R.x(p, hi) > R.x(p, lo) else 1.0
    return R.above(p.torso_height(), _YOGA_STAND_HEIGHT) * feet * correct


def _lying_down(p):
    return R.wmean(
        (3, R.below(p.torso_height(), _YOGA_LIE_DOWN_HEIGHT)),
        (1, 1 - abs(p.torso_upright())),
        (1, R.below(R.mean_z(p, ["left_thigh", "right_thigh"]), _YOGA_LIE_DOWN_HEIGHT)),
        (1, R.below(R.mean_z(p, ["left_foot", "right_foot"]), _YOGA_LIE_DOWN_HEIGHT)),
        (1, R.below(R.mean_z(p, ["left_leg", "right_leg"]), _YOGA_LIE_DOWN_HEIGHT)),
    )


def _legs_up(p):
    torso_down = R.wmean((3, R.below(p.torso_height(), _YOGA_LIE_DOWN_HEIGHT)),
                         (1, 1 - abs(p.torso_upright())))
    feet_up = R.above(R.mean_z(p, ["left_foot", "right_foot"]),
                      _YOGA_FEET_UP_LIE_DOWN_HEIGHT)
    return torso_down * feet_up


def _high_kick(p):
    lz, rz = R.z(p, "left_foot"), R.z(p, "right_foot")
    feet = R.wmean((3, R.above(max(lz, rz), walker._STAND_HEIGHT)),
                   (1, R.below(min(lz, rz), _YOGA_LIE_DOWN_HEIGHT)))
    return R.above(p.torso_height(), _YOGA_STAND_HEIGHT) * feet


def _one_foot(p):
    lz, rz = R.z(p, "left_foot"), R.z(p, "right_foot")
    return (R.above(p.torso_height(), _YOGA_STAND_HEIGHT)
            * R.above(max(lz, rz), _YOGA_FEET_UP_HEIGHT)
            * R.below(min(lz, rz), _YOGA_LIE_DOWN_HEIGHT))


def _lunge_pose(p):
    torso = R.wmean((3, R.above(p.torso_height(), _YOGA_KNEESTAND_HEIGHT)),
                    (1, (1 + p.torso_upright()) / 2))
    lz, rz = R.z(p, "left_leg"), R.z(p, "right_leg")
    hi_thigh = "left_thigh" if lz >= rz else "right_thigh"
    lo_leg = "left_leg" if lz < rz else "right_leg"
    legs = R.wmean(
        (1, R.below(min(lz, rz), _YOGA_LIE_DOWN_HEIGHT)),
        (1, R.above(max(lz, rz), _YOGA_KNEE_HEIGHT)),
        (1, R.horizontal01(p, hi_thigh)),
        (1, R.horizontal01(p, lo_leg)),
    )
    return torso * legs


def _sit_knees(p):
    torso_up = R.wmean((3, R.above(p.torso_height(), _YOGA_SITTING_HEIGHT)),
                       (1, (1 + p.torso_upright()) / 2))
    legs = R.wmean((3, R.below(R.mean_z(p, ["left_leg", "right_leg"]),
                               _YOGA_SITTING_LEGS_HEIGHT)),
                   (1, R.below(R.mean_z(p, ["left_foot", "right_foot"]),
                               _YOGA_LIE_DOWN_HEIGHT)))
    dist = lambda s: max(0.1, abs(R.x(p, f"{s}_foot") - R.x(p, f"{s}_thigh"))) - 0.1
    close = np.exp(-(dist("left") + dist("right")) / 2)
    return torso_up * legs * close


def _urlb_flip(p, forward=1):
    move = R.speed_at_least(forward * p.named.data.subtree_angmom["torso"][1],
                            _SPIN_SPEED, at_margin=0, margin=_SPIN_SPEED)
    stand = R.wmean((3, R.above(p.torso_height(), walker._STAND_HEIGHT)),
                    (1, (1 + p.torso_upright()) / 2))
    return stand * (5 * move + 1) / 6


def _flip(p, move_speed):
    upside_down = R.wmean(
        (3, R.above(R.mean_z(p, ["left_foot", "right_foot"]), _YOGA_LEGS_UP_HEIGHT)),
        (2, R.above(R.mean_z(p, ["left_thigh", "right_thigh"]), _YOGA_STAND_HEIGHT)))
    if move_speed == 0:
        return upside_down
    am = p.named.data.subtree_angmom["torso"][1]
    move = R.speed_at_least(am if move_speed > 0 else -am, abs(move_speed))
    return upside_down * (5 * move + 1) / 6


class YogaPlanarWalker(walker.PlanarWalker):
    """Goal-table yoga/motion tasks (reference: YogaPlanarWalker +
    BackwardsPlanarWalker, walker.py:250-488)."""

    def __init__(self, goal="arabesque", move_speed=0, random=None, backwards=False):
        super().__init__(0, random)
        self._goal = goal
        self._move_speed = move_speed
        self._backwards = backwards

    def get_reward(self, physics):
        if self._backwards:
            return _backwards(physics, self._move_speed)
        if self._goal == "flipping":
            return max(_flip(physics, abs(self._move_speed)),
                       _flip(physics, -abs(self._move_speed)))
        table = {
            "arabesque": _arabesque,
            "lying_down": _lying_down,
            "legs_up": _legs_up,
            "high_kick": _high_kick,
            "one_foot": _one_foot,
            "lunge_pose": _lunge_pose,
            "sit_knees": _sit_knees,
            "urlb_flip": lambda p: _urlb_flip(p),
            "flip": lambda p: _flip(p, self._move_speed),
        }
        return table[self._goal](physics)


TASKS = {
    "walk_backwards": dict(backwards=True, move_speed=walker._WALK_SPEED),
    "run_backwards": dict(backwards=True, move_speed=walker._RUN_SPEED),
    "arabesque": dict(goal="arabesque"),
    "lying_down": dict(goal="lying_down"),
    "legs_up": dict(goal="legs_up"),
    "high_kick": dict(goal="high_kick"),
    "one_foot": dict(goal="one_foot"),
    "lunge_pose": dict(goal="lunge_pose"),
    "sit_knees": dict(goal="sit_knees"),
    "headstand": dict(goal="flip", move_speed=0),
    "urlb_flip": dict(goal="urlb_flip", move_speed=_SPIN_SPEED),
    "flipping": dict(goal="flipping", move_speed=2 * walker._RUN_SPEED),
    "flip": dict(goal="flip", move_speed=2 * walker._RUN_SPEED),
    "backflip": dict(goal="flip", move_speed=-2 * walker._RUN_SPEED),
}


def make(task, task_kwargs=None, environment_kwargs=None, visualize_reward=False):
    task_kwargs = dict(task_kwargs or {})
    random = task_kwargs.pop("random", None)
    time_limit = task_kwargs.pop("time_limit", walker._DEFAULT_TIME_LIMIT)
    physics = walker.Physics.from_xml_string(*get_model_and_assets())
    task = YogaPlanarWalker(random=random, **TASKS[task])
    env = control.Environment(physics, task, time_limit=time_limit,
                              control_timestep=walker._CONTROL_TIMESTEP,
                              **(environment_kwargs or {}))
    env.task.visualize_reward = visualize_reward
    return env
