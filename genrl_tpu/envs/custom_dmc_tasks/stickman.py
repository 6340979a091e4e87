"""Stickman domain: a 2D humanoid with arms (21 tasks).

Rebuild of the reference's custom stickman domain
(envs/custom_dmc_tasks/stickman.py:1-646; MJCF model stickman.xml is a data
asset carried over verbatim). Goal rewards are table-driven compositions of
the shared pose primitives in _rewards.py; every bound/margin matches the
reference so task scores stay comparable (tools/task_scores.py bounds).
"""

from __future__ import annotations

import collections

import numpy as np
from dm_control import mujoco
from dm_control.rl import control
from dm_control.suite import base, common
from dm_control.suite.utils import randomizers
from dm_control.utils import io as resources

from genrl_tpu.envs.custom_dmc_tasks import _rewards as R

_DEFAULT_TIME_LIMIT = 25
_CONTROL_TIMESTEP = 0.025

_STAND_HEIGHT = 1.15
_WALK_SPEED = 1
_RUN_SPEED = 8
_SPIN_SPEED = 5.0
_PUNCH_SPEED = 5.0

_YOGA_HANDS_UP_HEIGHT = 1.75
_YOGA_STAND_HEIGHT = 1.0
_YOGA_LIE_DOWN_HEIGHT = 0.1
_YOGA_LEGS_UP_HEIGHT = 1.1
_YOGA_FEET_UP_HEIGHT = 0.5
_YOGA_FEET_UP_LIE_DOWN_HEIGHT = 0.35
_YOGA_KNEE_HEIGHT = 0.25
_YOGA_KNEESTAND_HEIGHT = 0.75
_YOGA_SITTING_HEIGHT = 0.55
_YOGA_SITTING_LEGS_HEIGHT = 0.15


class StickmanYogaPoses:
    """Joint configurations used by report panels and pose resets
    (values from the reference, stickman.py:36-57)."""

    lie_back = [-1.2, 0.0, -1.57, 0, 0.0, 0.0, 0, -0.0, 0.0]
    lie_front = [-1.2, -0, 1.57, 0, 0, 0, 0, 0.0, 0.0]
    legs_up = [-1.24, 0.0, -1.57, 1.57, 0.0, 0.0, 1.57, -0.0, 0.0]
    kneel = [-0.5, 0.0, 0, 0, -1.57, -0.8, 1.57, -1.57, 0.0]
    side_angle = [-0.3, 0.0, 0.9, 0, 0, -0.7, 1.87, -1.07, 0.0]
    stand_up = [-0.15, 0.0, 0.34, 0.74, -1.34, -0.0, 1.1, -0.66, -0.1]
    lean_back = [-0.27, 0.0, -0.45, 0.22, -1.5, 0.86, 0.6, -0.8, -0.4]
    boat = [-1.04, 0.0, -0.8, 1.6, 0.0, 0.0, 1.6, -0.0, 0.0]
    bridge = [-1.1, 0.0, -2.2, -0.3, -1.5, 0.0, -0.3, -0.8, -0.4]
    head_stand = [-1, 0.0, -3, 0.6, -1, -0.3, 0.9, -0.5, 0.3]
    one_feet = [-0.2, 0.0, 0, 0.7, -1.34, 0.5, 1.5, -0.6, 0.1]
    arabesque = [-0.34, 0.0, 1.57, 1.57, 0, 0.0, 0, -0.0, 0.0]
    high_kick = [-0.165, 3.3, 5.55, 1.35, -0, +0.5, -0.7, 0.0, 0.2]
    splits = [-0.7, 0.0, 0.5, -0.7, -1.0, 0, 1.75, 0.0, -0.45]
    sit_knees = [-0.6, -0.2, 0.2, 0.95, -2.5, 0, 0.95, -2.5, 0]


def get_model_and_assets():
    import os

    xml = resources.GetResource(
        os.path.join(os.path.dirname(__file__), "stickman.xml"))
    return xml, common.ASSETS


class Physics(mujoco.Physics):
    def torso_upright(self):
        return self.named.data.xmat["torso", "zz"]

    def torso_height(self):
        return self.named.data.xpos["torso", "z"]

    def horizontal_velocity(self):
        return self.named.data.sensordata["torso_subtreelinvel"][0]

    def orientations(self):
        return self.named.data.xmat[1:, ["xx", "xz"]].ravel()

    def angmomentum(self):
        return self.named.data.subtree_angmom["torso"][1]


# ---- goal rewards, table-driven ---------------------------------------------------


def _stand(p: Physics):
    return R.wmean((3, R.above(p.torso_height(), _STAND_HEIGHT)),
                   (1, R.upright01(p)))


def _locomotion(p: Physics, move_speed, forward):
    move = R.speed_at_least(forward * p.horizontal_velocity(), move_speed)
    return _stand(p) * (5 * move + 1) / 6


def _hands_up(p: Physics):
    hands = R.mean_z(p, ["left_hand", "right_hand"])
    return _stand(p) * R.above(hands, _YOGA_HANDS_UP_HEIGHT)


def _boxing(p: Physics):
    punch = max(abs(p.named.data.subtree_linvel["left_hand"][0]),
                abs(p.named.data.subtree_linvel["right_hand"][0]))
    return _stand(p) * R.speed_at_least(punch, _PUNCH_SPEED)


def _arabesque(p: Physics):
    lz, rz = R.z(p, "left_foot"), R.z(p, "right_foot")
    hi, lo = ("right_foot", "left_foot") if rz > lz else ("left_foot", "right_foot")
    feet = R.wmean((1, R.below(R.z(p, lo), _YOGA_LIE_DOWN_HEIGHT)),
                   (2, R.above(R.z(p, hi), _YOGA_STAND_HEIGHT)))
    correct = 0.1 if R.x(p, hi) > R.x(p, lo) else 1.0
    return R.above(p.torso_height(), _YOGA_STAND_HEIGHT) * feet * correct


def _lying_down(p: Physics):
    return R.wmean(
        (3, R.below(p.torso_height(), _YOGA_LIE_DOWN_HEIGHT)),
        (1, R.horizontal01(p)),
        (1, R.below(R.mean_z(p, ["left_thigh", "right_thigh"]), _YOGA_LIE_DOWN_HEIGHT)),
        (1, R.below(R.mean_z(p, ["left_foot", "right_foot"]), _YOGA_LIE_DOWN_HEIGHT)),
        (1, R.below(R.mean_z(p, ["left_leg", "right_leg"]), _YOGA_LIE_DOWN_HEIGHT)),
    )


def _legs_up(p: Physics):
    torso_down = R.wmean((3, R.below(p.torso_height(), _YOGA_LIE_DOWN_HEIGHT)),
                         (1, R.horizontal01(p)))
    feet_up = R.above(R.mean_z(p, ["left_foot", "right_foot"]),
                      _YOGA_FEET_UP_LIE_DOWN_HEIGHT)
    return torso_down * feet_up


def _high_kick(p: Physics):
    lz, rz = R.z(p, "left_foot"), R.z(p, "right_foot")
    feet = R.wmean((3, R.above(max(lz, rz), _STAND_HEIGHT)),
                   (1, R.below(min(lz, rz), _YOGA_LIE_DOWN_HEIGHT)))
    return R.above(p.torso_height(), _YOGA_STAND_HEIGHT) * feet


def _one_foot(p: Physics):
    lz, rz = R.z(p, "left_foot"), R.z(p, "right_foot")
    return (R.above(p.torso_height(), _YOGA_STAND_HEIGHT)
            * R.above(max(lz, rz), _YOGA_FEET_UP_HEIGHT)
            * R.below(min(lz, rz), _YOGA_LIE_DOWN_HEIGHT))


def _lunge_pose(p: Physics):
    torso = R.wmean((3, R.above(p.torso_height(), _YOGA_KNEESTAND_HEIGHT)),
                    (1, R.upright01(p)))
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


def _sit_knees(p: Physics):
    torso_up = R.wmean((3, R.above(p.torso_height(), _YOGA_SITTING_HEIGHT)),
                       (1, R.upright01(p)))
    legs = R.wmean((3, R.below(R.mean_z(p, ["left_leg", "right_leg"]),
                               _YOGA_SITTING_LEGS_HEIGHT)),
                   (1, R.below(R.mean_z(p, ["left_foot", "right_foot"]),
                               _YOGA_LIE_DOWN_HEIGHT)))
    dist = lambda side: max(0.1, abs(R.x(p, f"{side}_foot") - R.x(p, f"{side}_thigh"))) - 0.1
    close = np.exp(-(dist("left") + dist("right")) / 2)
    return torso_up * legs * close


def _urlb_flip(p: Physics, forward=1):
    move = R.speed_at_least(forward * p.angmomentum(), _SPIN_SPEED,
                            at_margin=0, margin=_SPIN_SPEED)
    stand = R.wmean((3, R.above(p.torso_height(), _STAND_HEIGHT)),
                    (1, R.upright01(p)))
    return stand * (5 * move + 1) / 6


def _flip(p: Physics, move_speed):
    upside_down = R.wmean(
        (3, R.above(R.mean_z(p, ["left_foot", "right_foot"]), _YOGA_LEGS_UP_HEIGHT)),
        (2, R.above(R.mean_z(p, ["left_thigh", "right_thigh"]), _YOGA_STAND_HEIGHT)))
    if move_speed == 0:
        return upside_down
    am = p.angmomentum()
    if move_speed > 0:
        move = R.speed_at_least(am, move_speed)
    else:
        move = R.speed_at_least(-am, -move_speed)
    return upside_down * (5 * move + 1) / 6


class Stickman(base.Task):
    """Planar stickman with goal-table rewards (reference: Stickman task,
    stickman.py:311-633)."""

    def __init__(self, move_speed=0.0, goal="walk", forward=True, random=None):
        self._move_speed = move_speed
        self._forward = 1 if forward else -1
        self._goal = goal
        super().__init__(random=random)

    def initialize_episode(self, physics):
        randomizers.randomize_limited_and_rotational_joints(physics, self.random)
        super().initialize_episode(physics)

    def get_observation(self, physics):
        obs = collections.OrderedDict()
        obs["orientations"] = physics.orientations()
        obs["height"] = physics.torso_height()
        obs["velocity"] = physics.velocity()
        return obs

    def get_reward(self, physics):
        goal = self._goal
        if goal in ("stand", "walk", "run"):
            return _locomotion(physics, self._move_speed, self._forward) \
                if self._move_speed else _stand(physics)
        if goal == "flipping":
            return max(_flip(physics, abs(self._move_speed)),
                       _flip(physics, -abs(self._move_speed)))
        table = {
            "hands_up": _hands_up,
            "boxing": _boxing,
            "arabesque": _arabesque,
            "lying_down": _lying_down,
            "legs_up": _legs_up,
            "high_kick": _high_kick,
            "one_foot": _one_foot,
            "lunge_pose": _lunge_pose,
            "sit_knees": _sit_knees,
            "urlb_flip": lambda p: _urlb_flip(p, self._forward),
            "flip": lambda p: _flip(p, self._move_speed),
        }
        if goal not in table:
            raise NotImplementedError(f"stickman goal {goal}")
        return table[goal](physics)


def _env(goal, move_speed=0.0, forward=True, time_limit=_DEFAULT_TIME_LIMIT,
         random=None, environment_kwargs=None):
    physics = Physics.from_xml_string(*get_model_and_assets())
    task = Stickman(move_speed=move_speed, goal=goal, forward=forward, random=random)
    return control.Environment(physics, task, time_limit=time_limit,
                               control_timestep=_CONTROL_TIMESTEP,
                               **(environment_kwargs or {}))


# task registry: name -> builder kwargs
TASKS = {
    "hands_up": dict(goal="hands_up"),
    "boxing": dict(goal="boxing"),
    "arabesque": dict(goal="arabesque"),
    "lying_down": dict(goal="lying_down"),
    "legs_up": dict(goal="legs_up"),
    "high_kick": dict(goal="high_kick"),
    "one_foot": dict(goal="one_foot"),
    "lunge_pose": dict(goal="lunge_pose"),
    "sit_knees": dict(goal="sit_knees"),
    "headstand": dict(goal="flip", move_speed=0),
    "urlb_flip": dict(goal="urlb_flip", move_speed=_SPIN_SPEED),
    "flipping": dict(goal="flipping", move_speed=2 * _RUN_SPEED),
    "flip": dict(goal="flip", move_speed=2 * _RUN_SPEED),
    "backflip": dict(goal="flip", move_speed=-2 * _RUN_SPEED),
    "stand": dict(goal="stand", move_speed=0),
    "walk": dict(goal="walk", move_speed=_WALK_SPEED),
    "run": dict(goal="run", move_speed=_RUN_SPEED),
}


def make(task, task_kwargs=None, environment_kwargs=None, visualize_reward=False):
    task_kwargs = dict(task_kwargs or {})
    env = _env(environment_kwargs=environment_kwargs, **TASKS[task], **task_kwargs)
    env.task.visualize_reward = visualize_reward
    return env
