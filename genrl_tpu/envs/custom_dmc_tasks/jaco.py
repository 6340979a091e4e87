"""Jaco arm multi-target reach tasks (composer-based).

Rebuild of envs/custom_dmc_tasks/jaco.py:1-221: four fixed target corners on
the table, Duplo prop as the target object, tolerance reward on TCP-target
distance. Built from dm_control.manipulation shared components.
"""

from __future__ import annotations

import collections

import numpy as np
from dm_control import composer
from dm_control.composer import initializers
from dm_control.composer.variation import distributions
from dm_control.entities import props
from dm_control.manipulation.shared import (arenas, cameras, constants,
                                            observations, robots, workspaces)
from dm_control.utils import rewards

_ReachWorkspace = collections.namedtuple(
    "_ReachWorkspace", ["target_bbox", "tcp_bbox", "arm_offset"])

_PROP_Z_OFFSET = 0.001
_TARGET_RADIUS = 0.05
_TIME_LIMIT = 10

_DUPLO_WORKSPACE = _ReachWorkspace(
    target_bbox=workspaces.BoundingBox(lower=(-0.1, -0.1, _PROP_Z_OFFSET),
                                       upper=(0.1, 0.1, _PROP_Z_OFFSET)),
    tcp_bbox=workspaces.BoundingBox(lower=(-0.1, -0.1, 0.2),
                                    upper=(0.1, 0.1, 0.4)),
    arm_offset=robots.ARM_OFFSET)

TASKS = {
    "reach_top_left": workspaces.BoundingBox(
        lower=(-0.09, 0.09, _PROP_Z_OFFSET), upper=(-0.09, 0.09, _PROP_Z_OFFSET)),
    "reach_top_right": workspaces.BoundingBox(
        lower=(0.09, 0.09, _PROP_Z_OFFSET), upper=(0.09, 0.09, _PROP_Z_OFFSET)),
    "reach_bottom_left": workspaces.BoundingBox(
        lower=(-0.09, -0.09, _PROP_Z_OFFSET), upper=(-0.09, -0.09, _PROP_Z_OFFSET)),
    "reach_bottom_right": workspaces.BoundingBox(
        lower=(0.09, -0.09, _PROP_Z_OFFSET), upper=(0.09, -0.09, _PROP_Z_OFFSET)),
}


class MTReach(composer.Task):
    """Bring the hand close to the task's target corner."""

    def __init__(self, task_id, arena, arm, hand, prop, obs_settings, workspace,
                 control_timestep):
        self._task_id = task_id
        self._arena = arena
        self._arm = arm
        self._hand = hand
        self._arm.attach(self._hand)
        self._arena.attach_offset(self._arm, offset=workspace.arm_offset)
        self.control_timestep = control_timestep
        self._tcp_initializer = initializers.ToolCenterPointInitializer(
            self._hand, self._arm,
            position=distributions.Uniform(*workspace.tcp_bbox),
            quaternion=workspaces.DOWN_QUATERNION)
        self._task_observables = cameras.add_camera_observables(
            arena, obs_settings, cameras.FRONT_CLOSE)
        target_pos_distribution = distributions.Uniform(*TASKS[task_id])
        self._prop = prop
        if prop:
            self._make_target_site(parent_entity=prop, visible=False)
            self._target = self._arena.add_free_entity(prop)
            self._prop_placer = initializers.PropPlacer(
                props=[prop], position=target_pos_distribution,
                quaternion=workspaces.uniform_z_rotation, settle_physics=True)
        else:
            self._target = self._make_target_site(parent_entity=arena, visible=True)
            self._target_placer = target_pos_distribution
        workspaces.add_bbox_site(
            body=self.root_entity.mjcf_model.worldbody,
            lower=workspace.tcp_bbox.lower, upper=workspace.tcp_bbox.upper,
            rgba=constants.GREEN, name="tcp_spawn_area")
        workspaces.add_bbox_site(
            body=self.root_entity.mjcf_model.worldbody,
            lower=workspace.target_bbox.lower, upper=workspace.target_bbox.upper,
            rgba=constants.BLUE, name="target_spawn_area")

    def _make_target_site(self, parent_entity, visible):
        return workspaces.add_target_site(
            body=parent_entity.mjcf_model.worldbody, radius=_TARGET_RADIUS,
            visible=visible, rgba=constants.RED, name="target_site")

    @property
    def root_entity(self):
        return self._arena

    @property
    def arm(self):
        return self._arm

    @property
    def hand(self):
        return self._hand

    @property
    def task_observables(self):
        return self._task_observables

    def get_reward(self, physics):
        hand_pos = physics.bind(self._hand.tool_center_point).xpos
        target_pos = physics.bind(self._target).xpos
        distance = np.linalg.norm(hand_pos - target_pos)
        return rewards.tolerance(distance, bounds=(0, _TARGET_RADIUS),
                                 margin=_TARGET_RADIUS)

    def initialize_episode(self, physics, random_state):
        self._hand.set_grasp(physics, close_factors=random_state.uniform())
        self._tcp_initializer(physics, random_state)
        if self._prop:
            self._prop_placer(physics, random_state)
        else:
            physics.bind(self._target).pos = self._target_placer(
                random_state=random_state)


def make(task_id, obs_type, seed, img_size=64):
    obs_settings = (observations.VISION if obs_type == "pixels"
                    else observations.PERFECT_FEATURES)
    cam = obs_settings.camera._replace(width=img_size, height=img_size)
    obs_settings = obs_settings._replace(camera=cam)
    time_limit = _TIME_LIMIT if obs_type == "pixels" else 10.04
    arena = arenas.Standard()
    arm = robots.make_arm(obs_settings=obs_settings)
    hand = robots.make_hand(obs_settings=obs_settings)
    prop = props.Duplo(observable_options=observations.make_options(
        obs_settings, observations.FREEPROP_OBSERVABLES))
    task = MTReach(task_id, arena=arena, arm=arm, hand=hand, prop=prop,
                   obs_settings=obs_settings, workspace=_DUPLO_WORKSPACE,
                   control_timestep=constants.CONTROL_TIMESTEP)
    return composer.Environment(task, time_limit=time_limit, random_state=seed)
