"""End-to-end agent tests on tiny shapes: Dreamer / GenRL / Plan2Explore
train steps run, losses are finite, params change, and the GenRL step pjits
over an 8-device CPU mesh (the multi-chip path the reference never had)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrl_tpu.agents.assembly import GenRLAgent, Plan2Explore, DreamerAgent, make_agent
from genrl_tpu.configs import TRAIN_BASE, COLLECT_BASE
from genrl_tpu.parallel import make_mesh, shard_batch, shard_params
from genrl_tpu.utils.config import Config


IMG = 16
ACT = 4
B, T = 4, 8


def tiny_cfg(base=TRAIN_BASE, **over):
    cfg = Config.from_dict(base)
    cfg.update_deep(
        dict(
            rssm=dict(ensemble=1, hidden=32, deter=32, stoch=4, discrete=4,
                      norm="layer", std_act="softplus", min_std=0.1, single_obs_posterior=True),
            # 16x16 images need a 2-layer stack: enc 16->7->2, dec 1->6->16
            encoder=dict(cfg.encoder.to_dict(), cnn_depth=8, cnn_kernels=(4, 4)),
            decoder=dict(cfg.decoder.to_dict(), cnn_depth=8, cnn_kernels=(6, 6)),
            reward_head=dict(layers=2, units=32, norm="layer", dist="twohot"),
            discount_head=dict(layers=2, units=32, norm="none", dist="binary"),
            actor=dict(layers=2, units=32, norm="layer", dist="normal", min_std=0.1),
            critic=dict(layers=2, units=32, norm="layer", dist="twohot"),
            batch_size=B, batch_length=T, imag_horizon=8,
            precision=32,
        )
    )
    cfg.update_deep(over)
    return cfg


def tiny_batch(rng, with_clip=False, batch=B):
    data = {
        "observation": rng.integers(0, 255, (batch, T, IMG, IMG, 3), np.uint8),
        "action": rng.normal(size=(batch, T, ACT)).astype(np.float32),
        "reward": rng.normal(size=(batch, T, 1)).astype(np.float32),
        "is_first": np.zeros((batch, T), bool),
        "is_terminal": np.zeros((batch, T), bool),
        "discount": np.ones((batch, T, 1), np.float32),
    }
    data["is_first"][:, 0] = True
    if with_clip:
        emb = rng.normal(size=(batch, T, 32)).astype(np.float32)
        data["clip_video"] = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    return data


OBS_SPACE = {"observation": (IMG, IMG, 3)}


def finite(tree):
    return all(bool(np.isfinite(np.asarray(x)).all()) for x in jax.tree_util.tree_leaves(tree))


class TestDreamer:
    def test_train_step(self, rng):
        cfg = tiny_cfg()
        cfg.update_deep({"agent": {"name": "dreamer", "grad_heads": ("decoder", "reward")}})
        agent = DreamerAgent(cfg, OBS_SPACE, ACT)
        state = agent.init(jax.random.PRNGKey(0))
        step = jax.jit(agent.train_step)
        data = tiny_batch(rng)
        state2, metrics = step(state, data, jax.random.PRNGKey(1))
        assert finite(metrics), {k: v for k, v in metrics.items()}
        assert float(metrics["model_loss"]) != 0.0
        # params actually moved
        d0 = jax.tree_util.tree_leaves(state.wm_params)[0]
        d1 = jax.tree_util.tree_leaves(state2.wm_params)[0]
        assert not np.allclose(d0, d1)
        assert "actor_loss" in metrics and "critic_loss" in metrics

    def test_policy_step(self, rng):
        cfg = tiny_cfg()
        cfg.update_deep({"agent": {"name": "dreamer", "grad_heads": ("decoder", "reward")}})
        agent = DreamerAgent(cfg, OBS_SPACE, ACT)
        state = agent.init(jax.random.PRNGKey(0))
        carry = agent.init_policy_carry(2)
        obs = {
            "observation": np.zeros((2, IMG, IMG, 3), np.uint8),
            "is_first": np.ones((2,), bool),
            "reward": np.zeros((2, 1), np.float32),
            "is_terminal": np.zeros((2,), bool),
        }
        pol = jax.jit(agent.policy_step, static_argnames=("eval_mode",))
        action, carry2 = pol(state, obs, carry, jax.random.PRNGKey(2))
        assert action.shape == (2, ACT)
        assert finite(action)
        action_eval, _ = pol(state, obs, carry2, jax.random.PRNGKey(3), eval_mode=True)
        assert finite(action_eval)


class TestGenRL:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cfg()
        cfg["viclip_emb_dim"] = 32
        cfg["n_frames"] = 4
        cfg.update_deep({"agent": {"connector_rssm": dict(
            ensemble=1, hidden=32, deter=32, stoch=4, discrete=4, norm="layer",
            std_act="softplus", min_std=0.1, single_obs_posterior=False, learn_initial=True)}})
        agent = GenRLAgent(cfg, OBS_SPACE, ACT, viclip_emb_dim=32, n_frames=4)
        state = agent.init(jax.random.PRNGKey(0))
        return agent, state

    def test_wm_connector_step(self, setup, rng):
        agent, state = setup
        data = tiny_batch(rng, with_clip=True)
        step = jax.jit(lambda s, d, k: agent.train_step(s, d, k, None, True, True))
        state2, metrics = step(state, data, jax.random.PRNGKey(1))
        assert finite(metrics), metrics
        assert "connector_kl" in metrics
        assert "aligner_cosine_distance" in metrics
        c0 = jax.tree_util.tree_leaves(state.connector_params)[0]
        c1 = jax.tree_util.tree_leaves(state2.connector_params)[0]
        assert not np.allclose(c0, c1)

    @pytest.mark.slow
    def test_imag_behavior_with_text_target(self, setup, rng):
        agent, state = setup
        data = tiny_batch(rng, with_clip=True)
        prompt = np.float32(rng.normal(size=(32,)))
        prompt /= np.linalg.norm(prompt)
        target = agent.make_unconditional_target(
            state, jnp.asarray(prompt), batch=B * T, key=jax.random.PRNGKey(5))
        assert target["deter"].shape[:2] == (agent.agent_cfg.imag_horizon + 1, B * T)
        step = jax.jit(lambda s, d, t, k: agent.train_step(s, d, k, t, True, True))
        state2, metrics = step(state, data, target, jax.random.PRNGKey(6))
        assert finite(metrics), {k: v for k, v in metrics.items() if not finite(v)}
        assert "imag_actor_loss" in metrics
        i0 = jax.tree_util.tree_leaves(state.imag.actor_params)[0]
        i1 = jax.tree_util.tree_leaves(state2.imag.actor_params)[0]
        assert not np.allclose(i0, i1)

    def test_imag_behavior_with_posterior_target(self, setup, rng):
        """target_from=posterior: a demonstration window encoded through the
        WM posterior is a valid behavior target (environment-gated variant of
        video_video_reward's connector target — see make_posterior_target)."""
        agent, state = setup
        hor = int(agent.agent_cfg.imag_horizon)
        demo = {
            "observation": jnp.asarray(
                rng.integers(0, 255, (hor + 1, IMG, IMG, 3), np.uint8)),
            "action": jnp.asarray(rng.normal(size=(hor + 1, ACT)), jnp.float32),
            "is_first": jnp.zeros(hor + 1, bool).at[0].set(True),
        }
        target = agent.make_posterior_target(
            state, demo, batch=B * T, key=jax.random.PRNGKey(5))
        assert target["deter"].shape[:2] == (hor + 1, B * T)
        # broadcast across columns: every batch column sees the same demo
        assert np.allclose(target["deter"][:, 0], target["deter"][:, -1])
        data = tiny_batch(rng, with_clip=True)
        step = jax.jit(lambda s, d, t, k: agent.train_step(s, d, k, t, False, False))
        state2, metrics = step(state, data, target, jax.random.PRNGKey(6))
        assert finite(metrics), {k: v for k, v in metrics.items() if not finite(v)}
        i0 = jax.tree_util.tree_leaves(state.imag.actor_params)[0]
        i1 = jax.tree_util.tree_leaves(state2.imag.actor_params)[0]
        assert not np.allclose(i0, i1)

    @pytest.mark.slow
    def test_data_free_step(self, setup, rng):
        agent, state = setup
        prompt = np.float32(rng.normal(size=(32,)))
        prompt /= np.linalg.norm(prompt)
        target = agent.make_unconditional_target(
            state, jnp.asarray(prompt), batch=B * T, key=jax.random.PRNGKey(5))
        step = jax.jit(lambda s, t, k: agent.train_step_data_free(
            s, k, t, B, T, "mix", True, 2))
        state2, metrics = step(state, target, jax.random.PRNGKey(7))
        assert finite(metrics), metrics
        assert "imag_actor_loss" in metrics

    @pytest.mark.slow
    def test_sharded_train_step(self, setup, rng):
        """The multi-device path: batch sharded over data axis, params replicated."""
        agent, state = setup
        mesh = make_mesh(data=-1, model=1)
        assert mesh.devices.size == 8
        data = tiny_batch(rng, with_clip=True, batch=8)
        state_s = shard_params(state, mesh)
        data_s = shard_batch(data, mesh)
        step = jax.jit(lambda s, d, k: agent.train_step(s, d, k, None, True, True))
        state2, metrics = step(state_s, data_s, jax.random.PRNGKey(1))
        assert finite(metrics)


class TestPlan2Explore:
    def test_train_step(self, rng):
        cfg = tiny_cfg(COLLECT_BASE)
        cfg.update_deep({"agent": {"name": "plan2explore"}})
        agent = Plan2Explore(cfg, OBS_SPACE, ACT)
        state = agent.init(jax.random.PRNGKey(0))
        data = tiny_batch(rng)
        step = jax.jit(agent.train_step)
        state2, metrics = step(state, data, jax.random.PRNGKey(1))
        assert finite(metrics), metrics
        assert "disagreement_loss" in metrics
        d0 = jax.tree_util.tree_leaves(state.disag_params)[0]
        d1 = jax.tree_util.tree_leaves(state2.disag_params)[0]
        assert not np.allclose(d0, d1)


def test_make_agent_factory():
    cfg = tiny_cfg()
    cfg["viclip_emb_dim"] = 32
    cfg["n_frames"] = 4
    agent = make_agent(cfg, OBS_SPACE, ACT)
    assert isinstance(agent, GenRLAgent)


@pytest.mark.slow
def test_bf16_train_step(rng):
    """precision=16 (bf16 compute, f32 params) — the DEFAULT for every real
    TPU run (configs.py precision=16, agents/dreamer.py:41) yet otherwise
    untested: every other test pins precision=32. One GenRL WM+connector+imag
    step must stay finite and move params under bf16."""
    cfg = tiny_cfg(precision=16)
    cfg["viclip_emb_dim"] = 32
    cfg["n_frames"] = 4
    cfg.update_deep({"agent": {"connector_rssm": dict(
        ensemble=1, hidden=32, deter=32, stoch=4, discrete=4, norm="layer",
        std_act="softplus", min_std=0.1, single_obs_posterior=False,
        learn_initial=True)}})
    agent = GenRLAgent(cfg, OBS_SPACE, ACT, viclip_emb_dim=32, n_frames=4)
    state = agent.init(jax.random.PRNGKey(0))
    # params stay f32 (param_dtype), only compute is bf16
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(state.wm_params))
    data = tiny_batch(rng, with_clip=True)
    prompt = np.float32(rng.normal(size=(32,)))
    prompt /= np.linalg.norm(prompt)
    target = agent.make_unconditional_target(
        state, jnp.asarray(prompt), batch=B * T, key=jax.random.PRNGKey(5))
    step = jax.jit(lambda s, d, t, k: agent.train_step(s, d, k, t, True, True))
    state2, metrics = step(state, data, target, jax.random.PRNGKey(6))
    assert finite(metrics), {k: v for k, v in metrics.items() if not finite(v)}
    for sub in ("wm_params", "connector_params"):
        a = jax.tree_util.tree_leaves(getattr(state, sub))[0]
        b = jax.tree_util.tree_leaves(getattr(state2, sub))[0]
        assert not np.allclose(a, b), sub
