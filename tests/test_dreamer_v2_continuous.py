"""Continuous-latent (discrete=0) RSSM path — the dreamer_v2 preset family:
WM train step, imagination behavior, and the general observe scan (the fused
path requires discrete sampling hoisting but must fall back cleanly)."""

import jax
import numpy as np
import pytest

from genrl_tpu.agents.assembly import DreamerAgent
from genrl_tpu.configs import TRAIN_BASE
from genrl_tpu.utils.config import Config

B, T, IMG, ACT = 3, 8, 16, 4


@pytest.fixture(scope="module")
def agent_state():
    cfg = Config.from_dict(TRAIN_BASE)
    cfg.update_deep(dict(
        rssm=dict(ensemble=1, hidden=32, deter=32, stoch=8, discrete=0,
                  norm="none", std_act="sigmoid2", min_std=0.1,
                  single_obs_posterior=False),
        encoder=dict(cfg.encoder.to_dict(), cnn_depth=8, cnn_kernels=(4, 4), norm="none"),
        decoder=dict(cfg.decoder.to_dict(), cnn_depth=8, cnn_kernels=(6, 6), norm="none"),
        reward_head=dict(layers=2, units=32, norm="none", dist="mse"),
        discount_head=dict(layers=2, units=32, norm="none", dist="binary"),
        actor=dict(layers=2, units=32, norm="none", dist="trunc_normal", min_std=0.1),
        critic=dict(layers=2, units=32, norm="none", dist="mse"),
        kl=dict(free=1.0, forward=False, balance=0.8, free_avg=False),
        image_dist="normal_unit_std",
        reward_ema=False,
        batch_size=B, batch_length=T, imag_horizon=6, precision=32,
    ))
    cfg.update_deep({"agent": {"name": "dreamer", "grad_heads": ("decoder", "reward")}})
    agent = DreamerAgent(cfg, {"observation": (IMG, IMG, 3)}, ACT)
    state = agent.init(jax.random.PRNGKey(0))
    return agent, state


def batch(rng):
    data = {
        "observation": rng.integers(0, 255, (B, T, IMG, IMG, 3), np.uint8),
        "action": rng.normal(size=(B, T, ACT)).astype(np.float32),
        "reward": rng.normal(size=(B, T, 1)).astype(np.float32),
        "is_first": np.zeros((B, T), bool),
        "is_terminal": np.zeros((B, T), bool),
        "discount": np.ones((B, T, 1), np.float32),
    }
    data["is_first"][:, 0] = True
    return data


@pytest.mark.slow
def test_continuous_train_step(agent_state, rng):
    agent, state = agent_state
    step = jax.jit(agent.train_step)
    state2, metrics = step(state, batch(rng), jax.random.PRNGKey(1))
    for k in ("model_loss", "kl_loss", "actor_loss", "critic_loss"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
    # posterior stats are (mean, std) — continuous branch exercised
    outs, _ = agent.observe_data(state2, batch(rng), jax.random.PRNGKey(2))
    assert "mean" in outs["post"] and "std" in outs["post"]
    assert float(np.min(np.asarray(outs["post"]["std"]))) >= 0.1  # min_std


def test_continuous_policy_step(agent_state, rng):
    agent, state = agent_state
    carry = agent.init_policy_carry(2)
    obs = {
        "observation": np.zeros((2, IMG, IMG, 3), np.uint8),
        "is_first": np.ones((2,), bool),
        "reward": np.zeros((2, 1), np.float32),
        "is_terminal": np.zeros((2,), bool),
    }
    action, carry2 = jax.jit(agent.policy_step)(state, obs, carry, jax.random.PRNGKey(3))
    assert action.shape == (2, ACT)
    # trunc_normal actor: actions clamped into [-1, 1]
    assert float(np.max(np.abs(np.asarray(action)))) <= 1.0