from genrl_tpu.data.replay import (
    ReplayBuffer,
    count_episodes,
    episode_len,
    load_episode,
    save_episode,
)

__all__ = [
    "ReplayBuffer",
    "count_episodes",
    "episode_len",
    "load_episode",
    "save_episode",
]
