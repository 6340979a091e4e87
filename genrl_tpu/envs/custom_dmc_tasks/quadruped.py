"""Quadruped domain extensions (9 extra tasks).

Rebuild of envs/custom_dmc_tasks/quadruped.py:1-669 on top of the dm_control
quadruped module (model generated via quadruped.make_model; quadruped.xml is
carried as a data asset for reference but dm_control's generator is used).
Bounds match the reference for score parity."""

from __future__ import annotations

import collections

import numpy as np
from dm_control.mujoco.wrapper import mjbindings
from dm_control.rl import control
from dm_control.suite import base, common, quadruped
from dm_control.utils import rewards

from genrl_tpu.envs.custom_dmc_tasks import _rewards as R

enums = mjbindings.enums

_DEFAULT_TIME_LIMIT = 20
_CONTROL_TIMESTEP = 0.02
_RUN_SPEED = 5
_WALK_SPEED = 0.5
_JUMP_HEIGHT = 1.0
_LIE_DOWN_HEIGHT = 0.2
_FOOT_DOWN_HEIGHT = 0.2
_FOOT_UP_HEIGHT = 0.8
_TOES = ["toe_front_left", "toe_front_right", "toe_back_left", "toe_back_right"]


class Physics(quadruped.Physics):
    def com_height(self):
        return self.named.data.sensordata["center_of_mass"].copy()[2]


def _find_non_contacting_height(physics, orientation, x_pos=0.0, y_pos=0.0):
    """Raise the body until it no longer penetrates the floor
    (same procedure as dm_control's quadruped._find_non_contacting_height)."""
    z_pos = 0.0
    num_contacts = 1
    attempts = 0
    while num_contacts > 0:
        try:
            with physics.reset_context():
                physics.named.data.qpos["root"][:3] = x_pos, y_pos, z_pos
                physics.named.data.qpos["root"][3:] = orientation
        except control.PhysicsError:
            pass
        num_contacts = physics.data.ncon
        z_pos += 0.01
        attempts += 1
        if attempts > 10000:
            raise RuntimeError("Failed to find a non-contacting configuration.")


def _common_observations(physics):
    obs = collections.OrderedDict()
    obs["egocentric_state"] = physics.egocentric_state()
    obs["torso_velocity"] = physics.torso_velocity()
    obs["torso_upright"] = physics.torso_upright()
    obs["imu"] = physics.imu()
    obs["force_torque"] = physics.force_torque()
    return obs


def _upright(physics, deviation_angle=0):
    deviation = np.cos(np.deg2rad(deviation_angle))
    return rewards.tolerance(physics.torso_upright(), bounds=(deviation, R.INF),
                             sigmoid="linear", margin=1 + deviation,
                             value_at_margin=0)


def _lie_down(physics):
    return R.below(R.z(physics, "torso"), _LIE_DOWN_HEIGHT)


def _two_legs(physics):
    toes = sorted(R.z(physics, t) for t in _TOES)
    min_toes = sum(toes[:2]) / 2
    max_toes = sum(toes[2:]) / 2
    # the reference uses integer division in the up-margin (quadruped.py:357)
    toes_up = rewards.tolerance(max_toes, bounds=(_FOOT_UP_HEIGHT, R.INF),
                                margin=_FOOT_UP_HEIGHT // 2)
    toes_down = R.below(min_toes, _FOOT_DOWN_HEIGHT)
    return toes_down * toes_up


class _RandomDropTask(base.Task):
    """Common initialize: random orientation dropped at non-contacting height
    (reference: Move/Stand/Jump/Roll.initialize_episode)."""

    def initialize_episode(self, physics):
        orientation = self.random.randn(4)
        orientation /= np.linalg.norm(orientation)
        _find_non_contacting_height(physics, orientation)
        super().initialize_episode(physics)

    def get_observation(self, physics):
        return _common_observations(physics)


class Move(_RandomDropTask):
    def __init__(self, desired_speed, random=None):
        self._desired_speed = desired_speed
        super().__init__(random=random)

    def get_reward(self, physics):
        move = R.speed_at_least(physics.torso_velocity()[0], self._desired_speed,
                                margin=self._desired_speed)
        return _upright(physics) * move


class Stand(_RandomDropTask):
    def __init__(self, random=None, goal="stand"):
        self._goal = goal
        super().__init__(random=random)

    def get_reward(self, physics):
        return {"stand": _upright, "lie_down": _lie_down, "two_legs": _two_legs}[
            self._goal](physics)


class Jump(_RandomDropTask):
    def __init__(self, desired_height, random=None):
        self._desired_height = desired_height
        super().__init__(random=random)

    def get_reward(self, physics):
        jump_up = R.speed_at_least(physics.com_height(), self._desired_height,
                                   margin=self._desired_height)
        return _upright(physics) * jump_up


class Roll(_RandomDropTask):
    def __init__(self, desired_speed, random=None):
        self._desired_speed = desired_speed
        super().__init__(random=random)

    def get_reward(self, physics):
        move = R.speed_at_least(np.linalg.norm(physics.torso_velocity()),
                                self._desired_speed, margin=self._desired_speed)
        return _upright(physics) * move


TASKS = {
    "walk": lambda random: Move(desired_speed=_WALK_SPEED, random=random),
    "run": lambda random: Move(desired_speed=_RUN_SPEED, random=random),
    "stand": lambda random: Stand(goal="stand", random=random),
    "lie_down": lambda random: Stand(goal="lie_down", random=random),
    "two_legs": lambda random: Stand(goal="two_legs", random=random),
    "jump": lambda random: Jump(desired_height=_JUMP_HEIGHT, random=random),
    "roll": lambda random: Roll(desired_speed=_WALK_SPEED, random=random),
    "roll_fast": lambda random: Roll(desired_speed=_RUN_SPEED, random=random),
    # escape/fetch (reference quadruped.py:74-166) reuse dm_control's own
    # task classes — the reference file is a dm_control derivative and its
    # Escape/Fetch rewards are identical to upstream's
    "escape": lambda random: quadruped.Escape(random=random),
    "fetch": lambda random: quadruped.Fetch(random=random),
}

# per-task model generation (reference escape: floor_size=1000 + terrain +
# rangefinders; fetch: walls_and_ball arena)
_MODEL_KWARGS = {
    "escape": dict(floor_size=1000, terrain=True, rangefinders=True),
    "fetch": dict(walls_and_ball=True),
}


def make(task, task_kwargs=None, environment_kwargs=None, visualize_reward=False):
    task_kwargs = dict(task_kwargs or {})
    random = task_kwargs.pop("random", None)
    time_limit = task_kwargs.pop("time_limit", _DEFAULT_TIME_LIMIT)
    xml_string = quadruped.make_model(
        **_MODEL_KWARGS.get(task, dict(floor_size=1000)))
    physics = Physics.from_xml_string(xml_string, common.ASSETS)
    env = control.Environment(physics, TASKS[task](random), time_limit=time_limit,
                              control_timestep=_CONTROL_TIMESTEP,
                              **(environment_kwargs or {}))
    env.task.visualize_reward = visualize_reward
    return env
