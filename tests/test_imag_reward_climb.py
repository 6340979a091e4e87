"""The headline GenRL mechanism, tested as a LEARNING claim: imagination
behavior updates must *increase* the prompt-alignment reward, not merely run.

The reference's promise (README.md:138-146) is that maximizing the
connector-target alignment reward in imagination produces behavior. The unit
tests assert one update is finite and changes params; this test asserts the
actor actually climbs the reward surface over many updates — the end-to-end
gradient path prompt embed -> connector video_imagine target -> aligned
reward (rewards/plugins.py) -> dynamics-backprop actor-critic
(agents/dreamer.py:behavior_update) -> policy improvement, at tiny scale on
the CPU mesh with fixed imagination starts.
"""

import jax
import numpy as np
import pytest

from genrl_tpu.agents.assembly import GenRLAgent

from test_agents import ACT, B, OBS_SPACE, T, tiny_batch, tiny_cfg


@pytest.mark.slow
def test_imag_behavior_climbs_alignment_reward():
    cfg = tiny_cfg()
    cfg["viclip_emb_dim"] = 32
    cfg["n_frames"] = 4
    cfg.update_deep({"agent": {"connector_rssm": dict(
        ensemble=1, hidden=32, deter=32, stoch=4, discrete=4, norm="layer",
        std_act="softplus", min_std=0.1, single_obs_posterior=False,
        learn_initial=True)}})
    # align_initial is the pipeline's measured-best variant (evidence/diag_alignment)
    cfg.update_deep({"agent": {"imag_reward_args": dict(
        cfg.agent.imag_reward_args.to_dict(),
        align_initial=True, align_sequence=False)}})
    # 10x the production actor/critic lr: at tiny scale the reachable reward
    # delta is small, so compress the climb into a testable update budget
    cfg.update_deep(dict(actor_opt=dict(cfg.actor_opt.to_dict(), lr=3e-4),
                         critic_opt=dict(cfg.critic_opt.to_dict(), lr=3e-4)))
    agent = GenRLAgent(cfg, OBS_SPACE, ACT, viclip_emb_dim=32, n_frames=4)
    state = agent.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    data = tiny_batch(rng, with_clip=True)

    # a few WM+connector steps so dynamics/features aren't raw init noise
    wm_step = jax.jit(lambda s, d, k: agent.train_step(s, d, k, None, True, True))
    key = jax.random.PRNGKey(1)
    for i in range(5):
        state, _ = wm_step(state, data, jax.random.fold_in(key, i))

    prompt = rng.normal(size=(32,)).astype(np.float32)
    prompt /= np.linalg.norm(prompt)
    target = agent.make_unconditional_target(
        state, jax.numpy.asarray(prompt), batch=B * T, key=jax.random.PRNGKey(2))

    outs, _ = jax.jit(agent.observe_data)(state, data, jax.random.PRNGKey(3))
    post = jax.tree_util.tree_map(jax.lax.stop_gradient, outs["post"])
    is_terminal = outs["is_terminal"]

    upd = jax.jit(lambda s, k: agent.update_imag_behavior(
        s, post, is_terminal, target, k))
    rewards = []
    for i in range(200):
        state, mets = upd(state, jax.random.fold_in(jax.random.PRNGKey(4), i))
        rewards.append(float(mets["imag_reward_mean"]))

    r = np.asarray(rewards)
    assert np.isfinite(r).all()
    early, late = r[:30].mean(), r[-30:].mean()
    # the actor must climb the alignment-reward surface clearly, not by noise
    # (calibrated: this setup climbs ~0.29 -> ~0.31 with bin-monotone means)
    assert late > early + 0.01, (early, late)
