"""Custom DMC domains (reference: envs/custom_dmc_tasks/__init__.py:1-12)."""

from genrl_tpu.envs.custom_dmc_tasks import cheetah, quadruped, stickman, walker


def make(domain, task, task_kwargs=None, environment_kwargs=None,
         visualize_reward=False):
    if domain == "stickman":
        return stickman.make(task, task_kwargs, environment_kwargs, visualize_reward)
    if domain == "walker":
        return walker.make(task, task_kwargs, environment_kwargs, visualize_reward)
    if domain == "cheetah":
        return cheetah.make(task, task_kwargs, environment_kwargs, visualize_reward)
    if domain == "quadruped":
        return quadruped.make(task, task_kwargs, environment_kwargs, visualize_reward)
    raise NotImplementedError(f"custom domain {domain}")


def make_jaco(task, obs_type, seed, img_size=64):
    from genrl_tpu.envs.custom_dmc_tasks import jaco

    return jaco.make(task, obs_type, seed, img_size)
