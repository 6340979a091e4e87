"""dm_env wrapper stack + dict-obs adapter.

Rebuild of the reference wrapper zoo (envs/main.py:12-338, 586-668) with the
same external protocol: `env.reset()/step(a) -> (dm_env.TimeStep, obs_dict)`
where obs_dict carries observation/is_first/is_last/is_terminal/reward/
action/discount (+ clip_video when the ViClip wrapper is on). Spaces are
framework-native BoxSpace (no gym dependency). The pixel path emits CHW
uint8 frames, matching the reference's on-disk episode schema.

Provenance note: the reference's wrapper zoo is itself drqv2/URLB-lineage
dm_env boilerplate with one canonical spelling per wrapper. Here the zoo is
restructured around two forwarding bases (`Forward` for the dm_env level,
`DictForward` for the dict-obs level) so each wrapper states only its delta —
the per-class reset/spec/getattr delegation the reference repeats eight times
exists once.
"""

from __future__ import annotations

from collections import deque

import dm_env
import numpy as np
from dm_env import specs

from genrl_tpu.envs.spaces import BoxSpace


class Forward(dm_env.Environment):
    """Forwarding base for dm_env-level wrappers: subclasses override only
    the methods whose behavior they change."""

    def __init__(self, env):
        self._env = env

    def reset(self):
        return self._env.reset()

    def step(self, action):
        return self._env.step(action)

    def observation_spec(self):
        return self._env.observation_spec()

    def action_spec(self):
        return self._env.action_spec()

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(self._env, name)


class DictForward:
    """Forwarding base for wrappers above the (TimeStep, obs_dict) protocol."""

    def __init__(self, env):
        self._env = env

    def reset(self):
        return self._env.reset()

    def step(self, action):
        return self._env.step(action)

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(self._env, name)


class ActionDTypeWrapper(Forward):
    """Cast agent actions to the env's declared dtype (envs/main.py:204-228)."""

    def __init__(self, env, dtype):
        super().__init__(env)
        spec = env.action_spec()
        self._action_spec = specs.BoundedArray(spec.shape, dtype, spec.minimum,
                                               spec.maximum, "action")

    def step(self, action):
        cast = np.asarray(action, dtype=self._env.action_spec().dtype)
        return self._env.step(cast)

    def action_spec(self):
        return self._action_spec


class ActionRepeatWrapper(Forward):
    """Apply each action `num_repeats` physics steps, accumulating the
    discounted reward and compounding the discount (envs/main.py:91-118)."""

    def __init__(self, env, num_repeats):
        super().__init__(env)
        self._num_repeats = num_repeats

    def step(self, action):
        total, discount, ts = 0.0, 1.0, None
        for _ in range(self._num_repeats):
            ts = self._env.step(action)
            total += discount * float(ts.reward or 0.0)
            discount *= ts.discount
            if ts.last():
                break
        return ts._replace(reward=total, discount=discount)


class FramesWrapper(Forward):
    """Extract pixels, stack num_frames along channels, CHW uint8
    (envs/main.py:121-174)."""

    def __init__(self, env, num_frames=1, pixels_key="pixels"):
        super().__init__(env)
        self._num_frames = num_frames
        self._frames = deque([], maxlen=num_frames)
        self._pixels_key = pixels_key
        shape = env.observation_spec()[pixels_key].shape
        if len(shape) == 4:
            shape = shape[1:]
        self._obs_spec = specs.BoundedArray(
            shape=(shape[2] * num_frames, shape[0], shape[1]),
            dtype=np.uint8, minimum=0, maximum=255, name="observation")

    def _pixels(self, time_step):
        pixels = time_step.observation[self._pixels_key]
        if pixels.ndim == 4:
            pixels = pixels[0]
        return pixels.transpose(2, 0, 1).copy()

    def _out(self, time_step):
        obs = np.concatenate(list(self._frames), axis=0)
        return time_step._replace(observation=obs)

    def reset(self):
        time_step = self._env.reset()
        px = self._pixels(time_step)
        for _ in range(self._num_frames):
            self._frames.append(px)
        return self._out(time_step)

    def step(self, action):
        time_step = self._env.step(action)
        self._frames.append(self._pixels(time_step))
        return self._out(time_step)

    def observation_spec(self):
        return self._obs_spec


class ObservationDTypeWrapper(Forward):
    """Flat state observations -> float32 'observation' (envs/main.py:231-258)."""

    def __init__(self, env, dtype=np.float32):
        super().__init__(env)
        self._dtype = dtype
        spec = env.observation_spec()["observations"]
        self._obs_spec = specs.Array(spec.shape, dtype, "observation")

    def _out(self, time_step):
        return time_step._replace(
            observation=time_step.observation["observations"].astype(self._dtype))

    def reset(self):
        return self._out(self._env.reset())

    def step(self, action):
        return self._out(self._env.step(action))

    def observation_spec(self):
        return self._obs_spec


class ActionScaleWrapper(Forward):
    """Map [-1, 1] agent actions onto the env's action bounds (replaces
    dm_control.suite.wrappers.action_scale in the reference stack)."""

    def __init__(self, env, minimum=-1.0, maximum=1.0):
        super().__init__(env)
        spec = env.action_spec()
        self._orig_min = np.asarray(spec.minimum, np.float64)
        self._orig_max = np.asarray(spec.maximum, np.float64)
        self._min = np.broadcast_to(np.asarray(minimum, np.float64), spec.shape)
        self._max = np.broadcast_to(np.asarray(maximum, np.float64), spec.shape)
        self._action_spec = specs.BoundedArray(spec.shape, spec.dtype, minimum,
                                               maximum, "action")

    def step(self, action):
        scale = (self._orig_max - self._orig_min) / (self._max - self._min)
        orig = (np.asarray(action) - self._min) * scale + self._orig_min
        return self._env.step(orig.astype(self._env.action_spec().dtype))

    def action_spec(self):
        return self._action_spec


class DictObs:
    """dm_env -> (TimeStep, obs_dict) protocol + obs/act spaces
    (reference: DMC, envs/main.py:292-338)."""

    def __init__(self, env):
        self._env = env

    def _obs(self, time_step, action, is_first):
        return {
            "reward": 0.0 if is_first else time_step.reward,
            "is_first": is_first,
            "is_last": time_step.last(),
            "is_terminal": False if is_first else time_step.discount == 0,
            "observation": time_step.observation,
            "action": action,
            "discount": (1.0 if time_step.discount is None
                         else time_step.discount),
        }

    def step(self, action):
        time_step = self._env.step(action)
        return time_step, self._obs(time_step, np.asarray(action, np.float32),
                                    is_first=False)

    def reset(self):
        time_step = self._env.reset()
        zero = np.zeros(self.act_space["action"].shape, np.float32)
        return time_step, self._obs(time_step, zero, is_first=True)

    @property
    def obs_space(self):
        spec = self._env.observation_spec()
        return {
            "observation": BoxSpace(0, 255, spec.shape, spec.dtype),
            "is_first": BoxSpace(0, 1, (), bool),
            "is_last": BoxSpace(0, 1, (), bool),
            "is_terminal": BoxSpace(0, 1, (), bool),
        }

    @property
    def act_space(self):
        spec = self._env.action_spec()
        return {"action": BoxSpace(spec.minimum, spec.maximum, spec.shape, np.float32)}

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(self._env, name)


class TimeLimit(DictForward):
    """End the episode after `duration` steps (envs/main.py:586-614)."""

    def __init__(self, env, duration):
        super().__init__(env)
        self._duration = duration
        self._step = None

    def step(self, action):
        assert self._step is not None, "Must reset environment."
        ts, obs = self._env.step(action)
        self._step += 1
        if self._duration and self._step >= self._duration:
            ts = dm_env.TimeStep(dm_env.StepType.LAST, ts.reward, ts.discount,
                                 ts.observation)
            obs["is_last"] = True
            self._step = None
        return ts, obs

    def reset(self):
        self._step = 0
        return self._env.reset()


class ClipActionWrapper(DictForward):
    """Clip continuous actions into [low, high] (envs/main.py:616-638)."""

    def __init__(self, env, low=-1.0, high=1.0):
        super().__init__(env)
        self._low = low
        self._high = high

    def step(self, action):
        return self._env.step(np.clip(action, self._low, self._high))


class NormalizeAction(DictForward):
    """Map [-1,1] to finite action bounds at the dict-protocol level
    (reference: envs/main.py:640-668)."""

    def __init__(self, env, key="action"):
        super().__init__(env)
        self._key = key
        space = env.act_space[key]
        self._mask = np.isfinite(space.low) & np.isfinite(space.high)
        self._low = np.where(self._mask, space.low, -1)
        self._high = np.where(self._mask, space.high, 1)

    @property
    def act_space(self):
        low = np.where(self._mask, -np.ones_like(self._low), self._low)
        high = np.where(self._mask, np.ones_like(self._high), self._high)
        return {**self._env.act_space, self._key: BoxSpace(low, high)}

    def step(self, action):
        orig = (action + 1) / 2 * (self._high - self._low) + self._low
        orig = np.where(self._mask, orig, action)
        return self._env.step(orig)


class OneHotAction(DictForward):
    """One-hot interface over a discrete-action env (envs/main.py:176-202)."""

    def __init__(self, env, n: int):
        super().__init__(env)
        self._n = n

    @property
    def act_space(self):
        return {"action": BoxSpace(0, 1, (self._n,), np.float32, discrete=True)}

    def step(self, action):
        index = int(np.argmax(action))
        onehot = np.zeros_like(action)
        onehot[index] = 1
        if not np.allclose(onehot, action):
            raise ValueError(f"Invalid one-hot action:\n{action}")
        return self._env.step(index)
