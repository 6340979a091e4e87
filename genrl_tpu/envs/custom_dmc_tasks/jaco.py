"""Jaco arm multi-target reach tasks (composer-based).

Rebuild of envs/custom_dmc_tasks/jaco.py:1-221 — four fixed target corners on
the table, a Duplo prop as the target object, tolerance reward on TCP-target
distance — assembled from dm_control.manipulation's shared components.

Provenance: the reference file is itself the dm_control Authors' Apache-2.0
composer task carried into GenRL (see PARITY.md). The composer API dictates
the task/arena/robot wiring; this version keeps only the prop-target reach
surface GenRL's tasks use (the reference's site-target/no-prop branch and
the generic `_reach` factory family are dropped).
"""

from __future__ import annotations

import numpy as np
from dm_control import composer
from dm_control.composer import initializers
from dm_control.composer.variation import distributions
from dm_control.entities import props
from dm_control.manipulation.shared import (arenas, cameras, constants,
                                            observations, robots, workspaces)
from dm_control.utils import rewards

_PROP_Z = 0.001        # resting height of the Duplo on the table
_TARGET_RADIUS = 0.05
_TIME_LIMIT = 10

# the four scored reach corners (x, y) on the tabletop
_CORNERS = {
    "reach_top_left": (-0.09, 0.09),
    "reach_top_right": (0.09, 0.09),
    "reach_bottom_left": (-0.09, -0.09),
    "reach_bottom_right": (0.09, -0.09),
}
TASKS = {
    name: workspaces.BoundingBox(lower=(x, y, _PROP_Z), upper=(x, y, _PROP_Z))
    for name, (x, y) in _CORNERS.items()
}

# TCP spawn volume above the table; prop bbox only drawn as a debug site
_TCP_BBOX = workspaces.BoundingBox(lower=(-0.1, -0.1, 0.2), upper=(0.1, 0.1, 0.4))
_PROP_BBOX = workspaces.BoundingBox(lower=(-0.1, -0.1, _PROP_Z), upper=(0.1, 0.1, _PROP_Z))


class MTReach(composer.Task):
    """Bring the hand's tool center point to the task's target corner."""

    def __init__(self, task_id, arena, arm, hand, prop, obs_settings,
                 control_timestep):
        self._arena, self._arm, self._hand, self._prop = arena, arm, hand, prop
        arm.attach(hand)
        arena.attach_offset(arm, offset=robots.ARM_OFFSET)
        self.control_timestep = control_timestep

        self._tcp_initializer = initializers.ToolCenterPointInitializer(
            hand, arm, position=distributions.Uniform(*_TCP_BBOX),
            quaternion=workspaces.DOWN_QUATERNION)
        self._task_observables = cameras.add_camera_observables(
            arena, obs_settings, cameras.FRONT_CLOSE)

        # target = the prop, placed at the task's fixed corner each episode
        workspaces.add_target_site(
            body=prop.mjcf_model.worldbody, radius=_TARGET_RADIUS,
            visible=False, rgba=constants.RED, name="target_site")
        self._target = arena.add_free_entity(prop)
        self._prop_placer = initializers.PropPlacer(
            props=[prop], position=distributions.Uniform(*TASKS[task_id]),
            quaternion=workspaces.uniform_z_rotation, settle_physics=True)

        for name, bbox, rgba in (("tcp_spawn_area", _TCP_BBOX, constants.GREEN),
                                 ("target_spawn_area", _PROP_BBOX, constants.BLUE)):
            workspaces.add_bbox_site(body=arena.mjcf_model.worldbody,
                                     lower=bbox.lower, upper=bbox.upper,
                                     rgba=rgba, name=name)

    root_entity = property(lambda self: self._arena)
    arm = property(lambda self: self._arm)
    hand = property(lambda self: self._hand)
    task_observables = property(lambda self: self._task_observables)

    def get_reward(self, physics):
        tcp = physics.bind(self._hand.tool_center_point).xpos
        target = physics.bind(self._target).xpos
        return rewards.tolerance(np.linalg.norm(tcp - target),
                                 bounds=(0, _TARGET_RADIUS),
                                 margin=_TARGET_RADIUS)

    def initialize_episode(self, physics, random_state):
        self._hand.set_grasp(physics, close_factors=random_state.uniform())
        self._tcp_initializer(physics, random_state)
        self._prop_placer(physics, random_state)


def make(task_id, obs_type, seed, img_size=64):
    obs_settings = (observations.VISION if obs_type == "pixels"
                    else observations.PERFECT_FEATURES)
    cam = obs_settings.camera._replace(width=img_size, height=img_size)
    obs_settings = obs_settings._replace(camera=cam)
    time_limit = _TIME_LIMIT if obs_type == "pixels" else 10.04
    task = MTReach(
        task_id,
        arena=arenas.Standard(),
        arm=robots.make_arm(obs_settings=obs_settings),
        hand=robots.make_hand(obs_settings=obs_settings),
        prop=props.Duplo(observable_options=observations.make_options(
            obs_settings, observations.FREEPROP_OBSERVABLES)),
        obs_settings=obs_settings,
        control_timestep=constants.CONTROL_TIMESTEP)
    return composer.Environment(task, time_limit=time_limit, random_state=seed)
