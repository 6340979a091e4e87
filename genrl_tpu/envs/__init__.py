"""Environment factory (reference: envs.make, envs/main.py:712-743).

make(name, obs_type, action_repeat, seed, img_size, viclip_encode,
clip_hd_rendering) -> env with `.reset()/.step(a) -> (TimeStep, obs_dict)`,
`.obs_space`, `.act_space`. Kitchen requires the vendored
relay-policy-learning stack (mujoco_py) and raises a clear error when that
toolchain is absent from the image.
"""

from __future__ import annotations

import os

import numpy as np


def _make_dmc(obs_type, domain, task, action_repeat, seed, img_size):
    from dm_control import suite

    from genrl_tpu.envs import custom_dmc_tasks as cdmc
    from genrl_tpu.envs.wrappers import (ActionDTypeWrapper, ActionRepeatWrapper)

    if (domain, task) in suite.ALL_TASKS:
        env = suite.load(domain, task, task_kwargs=dict(random=seed),
                         environment_kwargs=dict(flat_observation=True),
                         visualize_reward=False)
    else:
        env = cdmc.make(domain, task, task_kwargs=dict(random=seed),
                        environment_kwargs=dict(flat_observation=True),
                        visualize_reward=False)
    env = ActionDTypeWrapper(env, np.float32)
    env = ActionRepeatWrapper(env, action_repeat)
    if obs_type == "pixels":
        from dm_control.suite.wrappers import pixels

        camera_id = dict(locom_rodent=1, quadruped=2).get(domain, 0)
        env = pixels.Wrapper(env, pixels_only=True,
                             render_kwargs=dict(height=img_size, width=img_size,
                                                camera_id=camera_id))
        env._size = (img_size, img_size)
        env._camera = camera_id
    return env


def _make_jaco(obs_type, domain, task, action_repeat, seed, img_size):
    from genrl_tpu.envs import custom_dmc_tasks as cdmc
    from genrl_tpu.envs.jaco_wrappers import FlattenJacoObservationWrapper
    from genrl_tpu.envs.wrappers import ActionDTypeWrapper, ActionRepeatWrapper

    env = cdmc.make_jaco(task, obs_type, seed, img_size)
    env = ActionDTypeWrapper(env, np.float32)
    env = ActionRepeatWrapper(env, action_repeat)
    env = FlattenJacoObservationWrapper(env)
    env._size = (img_size, img_size)
    return env


def make(name, obs_type="pixels", action_repeat=2, seed=0, img_size=64,
         viclip_encode=False, clip_hd_rendering=False, viclip_model=None):
    assert obs_type in ("states", "pixels")
    domain, task = name.split("_", 1)

    from genrl_tpu.envs.wrappers import (ActionScaleWrapper, ClipActionWrapper,
                                         DictObs, FramesWrapper,
                                         ObservationDTypeWrapper, TimeLimit)

    if domain == "kitchen":
        from genrl_tpu.envs.kitchen import KitchenWrapper

        env = TimeLimit(
            KitchenWrapper(task, seed=seed, action_repeat=action_repeat,
                           size=(img_size, img_size)),
            280 // action_repeat)
    else:
        os.environ.setdefault("PYOPENGL_PLATFORM", "egl")
        os.environ.setdefault("MUJOCO_GL", "egl")
        domain = dict(cup="ball_in_cup", point="point_mass").get(domain, domain)
        make_fn = _make_jaco if domain == "jaco" else _make_dmc
        env = make_fn(obs_type, domain, task, action_repeat, seed, img_size)
        if obs_type == "pixels":
            env = FramesWrapper(env)
        else:
            env = ObservationDTypeWrapper(env, np.float32)
        env = ActionScaleWrapper(env, minimum=-1.0, maximum=+1.0)
        env = DictObs(env)
    env._domain_name = domain

    env = ClipActionWrapper(env)

    if viclip_encode:
        from genrl_tpu.envs.viclip_wrapper import ViClipWrapper

        env = ViClipWrapper(env, hd_rendering=clip_hd_rendering, clip=viclip_model)
    return env
