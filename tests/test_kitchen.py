"""Franka Kitchen port: protocol, rewards, completion, eval mode."""

import os

import numpy as np
import pytest

os.environ.setdefault("MUJOCO_GL", "egl")

pytest.importorskip("mujoco")


def make_env(task="kitchen_microwave", **kw):
    from genrl_tpu import envs

    return envs.make(task, "pixels", action_repeat=2, seed=0, img_size=48, **kw)


def test_reset_step_protocol():
    env = make_env()
    ts, obs = env.reset()
    assert obs["is_first"]
    assert obs["observation"].shape == (3, 48, 48)
    assert obs["state"].shape == (60,)
    a = env.act_space["action"].sample()
    assert a.shape == (9,)
    ts, obs = env.step(a)
    assert obs["reward"] < 0  # dense = negative goal distance
    assert not obs["is_last"]
    # rendered scene is non-trivial
    assert obs["observation"].astype(np.float32).std() > 5


@pytest.mark.parametrize("task", ["kitchen_light", "kitchen_slide", "kitchen_kettle",
                                  "kitchen_burner"])
def test_all_tasks_construct(task):
    env = make_env(task)
    ts, obs = env.reset()
    ts, obs = env.step(env.act_space["action"].sample())
    assert np.isfinite(obs["reward"])


def test_completion_bonus_and_termination():
    """Teleport the microwave joint to its goal: sparse bonus fires and the
    task terminates (reference semantics: kitchen_extra.py:204-236)."""
    from genrl_tpu.envs.kitchen import (FrankaKitchen, N_DOF_ROBOT,
                                        OBS_ELEMENT_INDICES, OBS_ELEMENT_GOALS)

    env = FrankaKitchen("microwave", dense=False, seed=0)
    env.reset()
    idx = OBS_ELEMENT_INDICES["microwave"]
    env.data.qpos[idx] = OBS_ELEMENT_GOALS["microwave"]
    obs, reward, done, info = env.step(np.zeros(9))
    assert info["bonus"] == 1.0
    assert reward == 1.0
    assert done


def test_eval_mode_sparse():
    env = make_env()
    env.eval_mode()
    ts, obs = env.reset()
    ts, obs = env.step(np.zeros(9, np.float32))
    assert obs["reward"] in (0.0, 1.0)


@pytest.mark.slow
def test_time_limit_wiring():
    env = make_env()
    ts, obs = env.reset()
    for _ in range(140):  # 280 // action_repeat
        ts, obs = env.step(np.zeros(9, np.float32))
        if obs["is_last"]:
            break
    assert obs["is_last"]


@pytest.mark.parametrize("task", ["kitchen_microwave_kettle_burner_light",
                                  "kitchen_all"])
def test_multi_element_tasks(task):
    """The 4 multi-element task classes (kitchen_extra.py:292-308): dense
    reward sums negative distances over ALL remaining elements; completion
    removes elements independently."""
    env = make_env(task)
    ts, obs = env.reset()
    n_elements = len(env.tasks_to_complete)
    assert n_elements >= 4
    a = env.act_space["action"].sample()
    ts, obs = env.step(a)
    assert np.isfinite(obs["reward"])
    # dense reward accumulates one -distance term per remaining element, so
    # it is notably more negative than any single-element task's
    single = make_env("kitchen_microwave")
    single.reset()
    _, obs1 = single.step(a)
    assert obs["reward"] < obs1["reward"] + 1e-6
