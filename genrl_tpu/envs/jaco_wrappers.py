"""Jaco observation flattening (reference: envs/main.py:32-88)."""

from __future__ import annotations

from collections import OrderedDict

import dm_env
import numpy as np
from dm_env import specs


class FlattenJacoObservationWrapper(dm_env.Environment):
    def __init__(self, env):
        self._env = env
        self._obs_spec = OrderedDict()
        wrapped = OrderedDict(env.observation_spec())
        if "front_close" in wrapped:
            spec = wrapped.pop("front_close")
            self._obs_spec["pixels"] = specs.BoundedArray(
                shape=spec.shape[1:], dtype=spec.dtype, minimum=spec.minimum,
                maximum=spec.maximum, name="pixels")
        dim = int(sum(np.prod(spec.shape) for spec in wrapped.values()))
        self._obs_spec["observations"] = specs.Array(shape=(dim,), dtype=np.float32,
                                                     name="observations")

    def _transform(self, time_step):
        obs = OrderedDict()
        observation = dict(time_step.observation)
        if "front_close" in observation:
            obs["pixels"] = np.squeeze(observation.pop("front_close"))
        features = [v.ravel() for v in observation.values()]
        obs["observations"] = np.concatenate(features, axis=0).astype(np.float32)
        return time_step._replace(observation=obs)

    def reset(self):
        return self._transform(self._env.reset())

    def step(self, action):
        return self._transform(self._env.step(action))

    def observation_spec(self):
        return self._obs_spec

    def action_spec(self):
        return self._env.action_spec()

    def __getattr__(self, name):
        return getattr(self._env, name)
