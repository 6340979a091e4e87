from genrl_tpu.rewards.plugins import (
    TASK2PROMPT,
    TASK2VIDEO,
    REWARD_REGISTRY,
    RewardSpec,
    compute_reward,
    env_reward_fn,
    make_aligned_reward_fn,
    resolve_reward,
)

__all__ = [
    "TASK2PROMPT",
    "TASK2VIDEO",
    "REWARD_REGISTRY",
    "RewardSpec",
    "compute_reward",
    "env_reward_fn",
    "make_aligned_reward_fn",
    "resolve_reward",
]
