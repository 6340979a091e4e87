"""Learning sanity: a tiny world model on a deterministic synthetic world
must reduce its reconstruction + reward losses by a large factor within a
few hundred steps. Catches silent gradient/optimizer wiring breaks that
shape tests cannot."""

import jax
import numpy as np
import pytest

from genrl_tpu.agents.assembly import DreamerAgent
from genrl_tpu.configs import TRAIN_BASE
from genrl_tpu.utils.config import Config

IMG, ACT, B, T = 16, 2, 8, 10


def synthetic_batch(rng):
    """A square whose x-position integrates the first action dim; reward is
    the x-position. Fully predictable from (state, action)."""
    obs = np.zeros((B, T, IMG, IMG, 3), np.uint8)
    actions = rng.choice([-1.0, 1.0], size=(B, T, ACT)).astype(np.float32)
    rewards = np.zeros((B, T, 1), np.float32)
    for b in range(B):
        x = IMG // 2
        for t in range(T):
            x = int(np.clip(x + 3 * actions[b, t, 0], 2, IMG - 3))
            obs[b, t, :, :] = 20
            obs[b, t, 4:12, x - 2 : x + 2] = 230
            rewards[b, t, 0] = x / IMG
    return {
        "observation": obs,
        "action": actions,
        "reward": rewards,
        "is_first": np.eye(1, T, dtype=bool)[0][None].repeat(B, 0),
        "is_terminal": np.zeros((B, T), bool),
        "discount": np.ones((B, T, 1), np.float32),
    }


def test_wm_learns_synthetic_world(rng):
    cfg = Config.from_dict(TRAIN_BASE)
    cfg.update_deep(dict(
        rssm=dict(ensemble=1, hidden=64, deter=64, stoch=8, discrete=8,
                  norm="layer", std_act="softplus", min_std=0.1,
                  single_obs_posterior=True),
        encoder=dict(cfg.encoder.to_dict(), cnn_depth=8, cnn_kernels=(4, 4)),
        decoder=dict(cfg.decoder.to_dict(), cnn_depth=8, cnn_kernels=(6, 6)),
        reward_head=dict(layers=2, units=64, norm="layer", dist="twohot"),
        discount_head=dict(layers=2, units=64, norm="none", dist="binary"),
        actor=dict(layers=2, units=64, norm="layer", dist="normal", min_std=0.1),
        critic=dict(layers=2, units=64, norm="layer", dist="twohot"),
        model_opt=dict(opt="adam", lr=3e-4, eps=1e-8, clip=1000, wd=1e-6),
        batch_size=B, batch_length=T, imag_horizon=5, precision=32,
    ))
    cfg.update_deep({"agent": {"name": "dreamer", "grad_heads": ("decoder", "reward")}})
    agent = DreamerAgent(cfg, {"observation": (IMG, IMG, 3)}, ACT)
    state = agent.init(jax.random.PRNGKey(0))
    step = jax.jit(agent.wm_train_step)

    losses = []
    keys = jax.random.split(jax.random.PRNGKey(1), 200)
    for i in range(200):
        state, outs, metrics = step(state, synthetic_batch(rng), keys[i])
        losses.append((float(metrics["observation_loss"]),
                       float(metrics["reward_loss"])))
    first_obs = np.mean([l[0] for l in losses[:10]])
    last_obs = np.mean([l[0] for l in losses[-10:]])
    first_rew = np.mean([l[1] for l in losses[:10]])
    last_rew = np.mean([l[1] for l in losses[-10:]])
    assert last_obs < first_obs * 0.2, (first_obs, last_obs)
    assert last_rew < first_rew * 0.5, (first_rew, last_rew)
