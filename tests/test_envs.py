"""Env-matrix smoke tests (the reference's one test, test/test_env.py:16-22,
extended): build each task, one reset + one random step, check the obs dict
protocol. Kitchen/jaco are gated by dependency availability."""

import os

import numpy as np
import pytest

os.environ.setdefault("MUJOCO_GL", "egl")

from genrl_tpu.utils.task_scores import MAX

# a representative subset per domain (full 39-task sweep is slow; CI smoke)
SMOKE_TASKS = [
    "stickman_walk", "stickman_run", "stickman_stand", "stickman_boxing",
    "stickman_flipping", "stickman_high_kick", "stickman_sit_knees",
    "stickman_hands_up", "stickman_headstand",
    "walker_walk", "walker_run", "walker_arabesque", "walker_flipping",
    "walker_lying_down", "walker_one_foot",
    "cheetah_run", "cheetah_flipping", "cheetah_standing", "cheetah_lying_down",
    "quadruped_walk", "quadruped_run", "quadruped_two_legs", "quadruped_jump",
    "quadruped_lie_down", "quadruped_escape", "quadruped_fetch",
    # composer/kitchen factory paths (reference test matrix includes them:
    # test/test_env.py:16-22 iterates every task_scores entry)
    "jaco_reach_top_left", "jaco_reach_bottom_right",
    "kitchen_microwave", "kitchen_light", "kitchen_slide",
]


def _smoke(task, img_size=32):
    from genrl_tpu import envs

    env = envs.make(task, "pixels", action_repeat=2, seed=0, img_size=img_size)
    ts, obs = env.reset()
    assert obs["is_first"] and not obs["is_last"]
    assert obs["observation"].shape == (3, img_size, img_size)
    assert obs["observation"].dtype == np.uint8
    action = env.act_space["action"].sample()
    ts, obs = env.step(action)
    assert not obs["is_first"]
    assert np.isfinite(obs["reward"])
    if task.startswith("kitchen"):
        # kitchen dense rewards are unbounded distances, not tolerances
        assert -10.0 <= obs["reward"] <= 10.0
    else:
        # tolerance-shaped rewards in [0, 1] summed over action_repeat=2
        # steps (dmc domains and jaco reach alike)
        assert 0.0 <= obs["reward"] <= 2.0 + 1e-6
    assert obs["action"].shape == action.shape


@pytest.mark.parametrize("task", SMOKE_TASKS)
def test_env_reset_step(task):
    _smoke(task)


@pytest.mark.slow
@pytest.mark.parametrize("task", sorted(MAX))
def test_env_full_matrix(task):
    """The reference's full sweep (test/test_env.py:16-22): every scored task
    constructs, resets and steps through the envs.make factory path."""
    _smoke(task)


def test_all_task_scores_have_env_coverage():
    """Every scored task's domain must be constructible (kitchen/jaco gated)."""
    domains = {t.split("_", 1)[0] for t in MAX}
    assert domains == {"walker", "quadruped", "kitchen", "stickman", "cheetah", "jaco"}


def test_action_repeat_and_time_limit():
    from genrl_tpu import envs

    env = envs.make("walker_walk", "pixels", action_repeat=2, seed=0, img_size=32)
    ts, obs = env.reset()
    steps = 0
    a = env.act_space["action"].sample()
    while not obs["is_last"]:
        ts, obs = env.step(a)
        steps += 1
        assert steps <= 600
    # dm_control walker: 25s / .025 ctrl = 1000 steps / action_repeat 2 = 500
    assert steps == 500


def test_states_obs_type():
    from genrl_tpu import envs

    env = envs.make("walker_walk", "states", action_repeat=2, seed=0)
    ts, obs = env.reset()
    assert obs["observation"].ndim == 1
    assert obs["observation"].dtype == np.float32
