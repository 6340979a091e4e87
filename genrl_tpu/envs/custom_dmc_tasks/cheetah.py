"""Cheetah domain extensions (6 extra tasks).

Rebuild of envs/custom_dmc_tasks/cheetah.py:1-247 (cheetah.xml carried over
as a data asset). Bounds match the reference for score parity."""

from __future__ import annotations

import collections
import os

from dm_control import mujoco
from dm_control.rl import control
from dm_control.suite import base, common
from dm_control.utils import io as resources, rewards

from genrl_tpu.envs.custom_dmc_tasks import _rewards as R

_DEFAULT_TIME_LIMIT = 10
_DOWN_HEIGHT = 0.15
_HIGH_HEIGHT = 1.00
_MID_HEIGHT = 0.45
_RUN_SPEED = 10
_SPIN_SPEED = 5


def get_model_and_assets():
    xml = resources.GetResource(os.path.join(os.path.dirname(__file__), "cheetah.xml"))
    return xml, common.ASSETS


class Physics(mujoco.Physics):
    def speed(self):
        return self.named.data.sensordata["torso_subtreelinvel"][0]

    def angmomentum(self):
        return self.named.data.subtree_angmom["torso"][1]


class Cheetah(base.Task):
    """(reference: Cheetah task, cheetah.py:153-247)."""

    def __init__(self, goal=None, forward=True, flip=False, random=None):
        self._forward = 1 if forward else -1
        self._flip = flip
        self._goal = goal
        super().__init__(random=random)

    def initialize_episode(self, physics):
        assert physics.model.nq == physics.model.njnt
        is_limited = physics.model.jnt_limited == 1
        lower, upper = physics.model.jnt_range[is_limited].T
        physics.data.qpos[is_limited] = self.random.uniform(lower, upper)
        for _ in range(200):
            physics.step()
        physics.data.time = 0
        super().initialize_episode(physics)

    def get_observation(self, physics):
        obs = collections.OrderedDict()
        obs["position"] = physics.data.qpos[1:].copy()
        obs["velocity"] = physics.velocity()
        return obs

    def _flip_reward(self, physics, forward):
        return R.speed_at_least(forward * physics.angmomentum(), _SPIN_SPEED,
                                at_margin=0, margin=_SPIN_SPEED)

    def get_reward(self, physics):
        goal = self._goal
        if goal in ("run", "flip", "run_backward", "flip_backward"):
            if self._flip:
                return self._flip_reward(physics, self._forward)
            return R.speed_at_least(self._forward * physics.speed(), _RUN_SPEED,
                                    at_margin=0, margin=_RUN_SPEED)
        if goal == "lying_down":
            torso_down = R.below(R.z(physics, "torso"), _DOWN_HEIGHT)
            feet = R.z(physics, "bfoot") + R.z(physics, "ffoot")
            feet_up = R.above(feet, _MID_HEIGHT)
            return (torso_down + feet_up) / 2
        if goal == "flipping":
            return max(self._flip_reward(physics, 1), self._flip_reward(physics, -1))
        if goal == "standing":
            bz, fz = R.z(physics, "bfoot"), R.z(physics, "ffoot")
            return (R.above(max(bz, fz), _HIGH_HEIGHT)
                    * R.below(min(bz, fz), _DOWN_HEIGHT))
        raise NotImplementedError(goal)


TASKS = {
    "flipping": dict(goal="flipping", forward=False, flip=False),
    "standing": dict(goal="standing", forward=False, flip=False),
    "lying_down": dict(goal="lying_down", forward=False, flip=False),
    "run_backward": dict(goal="run_backward", forward=False, flip=False),
    "flip": dict(goal="flip", forward=True, flip=True),
    "flip_backward": dict(goal="flip_backward", forward=False, flip=True),
}


def make(task, task_kwargs=None, environment_kwargs=None, visualize_reward=False):
    task_kwargs = dict(task_kwargs or {})
    random = task_kwargs.pop("random", None)
    time_limit = task_kwargs.pop("time_limit", _DEFAULT_TIME_LIMIT)
    physics = Physics.from_xml_string(*get_model_and_assets())
    task = Cheetah(random=random, **TASKS[task])
    env = control.Environment(physics, task, time_limit=time_limit,
                              **(environment_kwargs or {}))
    env.task.visualize_reward = visualize_reward
    return env
