"""Fused observe path == general per-step path (deterministic mode).

The fused path (single_obs_posterior: posterior/prior stats and GRU input
projections hoisted out of the scan) must agree numerically with the
reference-shaped per-step obs_step loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrl_tpu.models.rssm import RSSM
from genrl_tpu.models.connector import VideoSSM

B, T, A, E = 3, 6, 4, 16


@pytest.fixture(scope="module")
def rssm_setup():
    mod = RSSM(action_dim=A, embed_dim=E, ensemble=1, stoch=4, deter=16, hidden=16,
               discrete=4, norm="layer", single_obs_posterior=True, cell_input="stoch")
    rng = np.random.default_rng(0)
    embed = jnp.asarray(rng.normal(size=(B, T, E)), jnp.float32)
    action = jnp.asarray(rng.normal(size=(B, T, A)), jnp.float32)
    is_first = np.zeros((B, T), bool)
    is_first[:, 0] = True
    is_first[1, 3] = True  # mid-sequence reset exercises the masking
    is_first = jnp.asarray(is_first)
    params = mod.init(jax.random.PRNGKey(0), embed, action, is_first,
                      jax.random.PRNGKey(1), method="observe")
    return mod, params, embed, action, is_first


def general_observe(mod, params, embed, action, is_first, key):
    """Reference-shaped per-step loop (the general obs_step path)."""
    state = mod.initial(B)
    posts, priors = [], []
    keys = jax.random.split(key, T)
    for t in range(T):
        post, prior = mod.apply(
            params, state, action[:, t], embed[:, t], is_first[:, t], keys[t], False,
            method="obs_step")
        posts.append(post)
        priors.append(prior)
        state = post
    stack = lambda seq: {k: jnp.stack([s[k] for s in seq], 1) for k in seq[0]}
    return stack(posts), stack(priors)


def test_fused_observe_matches_general(rssm_setup):
    mod, params, embed, action, is_first = rssm_setup
    key = jax.random.PRNGKey(2)
    post_f, prior_f = mod.apply(params, embed, action, is_first, key,
                                should_sample=False, method="observe")
    post_g, prior_g = general_observe(mod, params, embed, action, is_first, key)
    np.testing.assert_allclose(post_f["logit"], post_g["logit"], atol=1e-4)
    np.testing.assert_allclose(post_f["deter"], post_g["deter"], atol=1e-4)
    np.testing.assert_allclose(post_f["stoch"], post_g["stoch"], atol=1e-4)
    np.testing.assert_allclose(prior_f["logit"], prior_g["logit"], atol=1e-4)


def test_fused_connector_update_matches_general():
    """ensemble=1 fused teacher-forced rollout == the general scan path."""
    rng = np.random.default_rng(1)
    emb_dim, n = 8, 2
    video_embed = jnp.asarray(rng.normal(size=(B, T, emb_dim)), jnp.float32)
    wm_post = {
        "stoch": jnp.asarray(rng.normal(size=(B, T, 4, 4)), jnp.float32),
        "deter": jnp.asarray(rng.normal(size=(B, T, 16)), jnp.float32),
        "logit": jnp.asarray(rng.normal(size=(B, T, 4, 4)), jnp.float32),
    }
    kw = dict(action_dim=emb_dim + n, embed_dim=emb_dim, ensemble=1, stoch=4,
              deter=16, hidden=16, discrete=4, norm="layer", has_posterior=False,
              cell_input="stoch", n_frames=n, denoising_ae=False,
              clip_lafite_noise=0.0, learn_initial=True)
    fused = VideoSSM(**kw, fused=True)
    general = VideoSSM(**kw, fused=False)
    params = fused.init(jax.random.PRNGKey(0), video_embed, wm_post,
                        jax.random.PRNGKey(1), method="update")

    loss_f, mets_f = fused.apply(params, video_embed, wm_post, jax.random.PRNGKey(2),
                                 method="update")
    loss_g, mets_g = general.apply(params, video_embed, wm_post, jax.random.PRNGKey(2),
                                   method="update")
    # sampled stoch values differ between paths (different key usage) but the
    # KL loss depends only on the deterministic stats — it must agree
    np.testing.assert_allclose(float(loss_f), float(loss_g), atol=1e-4)
    np.testing.assert_allclose(float(mets_f["connector_kl"]),
                               float(mets_g["connector_kl"]), atol=1e-4)


def test_video_imagine_reset_scan_matches_chunked():
    """video_imagine(reset_every_n_frames=True) is one lax.scan with a carry
    reset at chunk boundaries; in deterministic mode it must exactly equal
    the manually-chunked rollout (reference semantics video_utils.py:223-237)."""
    rng = np.random.default_rng(3)
    emb_dim, n, T_long = 8, 2, 8
    kw = dict(action_dim=emb_dim + n, embed_dim=emb_dim, ensemble=1, stoch=4,
              deter=16, hidden=16, discrete=4, norm="layer", has_posterior=False,
              cell_input="stoch", n_frames=n, denoising_ae=False,
              clip_lafite_noise=0.0, learn_initial=True)
    mod = VideoSSM(**kw)
    video_embed = jnp.asarray(rng.normal(size=(B, T_long, emb_dim)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), video_embed, jax.random.PRNGKey(1),
                      sample=False, reset_every_n_frames=True,
                      method="video_imagine")

    out = mod.apply(params, video_embed, jax.random.PRNGKey(2), sample=False,
                    reset_every_n_frames=True, method="video_imagine")

    # manual chunked rollout (the reference's python loop)
    action = mod.apply(params, video_embed, method="get_action")
    init = mod.apply(params, B, action[:, 0], jax.random.PRNGKey(2),
                     False, method="initial_learned")
    chunks = []
    for c in range(T_long // n):
        prior = mod.apply(params, action[:, c * n:(c + 1) * n],
                          jax.random.PRNGKey(9), init, False, method="imagine")
        chunks.append(prior)
        init = mod.initial(B)
        init["stoch"] = prior["stoch"][:, -1]
    ref = {k: jnp.concatenate([c[k] for c in chunks], 1) for k in chunks[0]}
    for k in ("deter", "stoch", "logit"):
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)


def test_fused_observe_dispatch_flag(rssm_setup):
    """fused=False forces the general path; results stay deterministic-equal."""
    mod, params, embed, action, is_first = rssm_setup
    gen = RSSM(action_dim=A, embed_dim=E, ensemble=1, stoch=4, deter=16, hidden=16,
               discrete=4, norm="layer", single_obs_posterior=True,
               cell_input="stoch", fused=False)
    key = jax.random.PRNGKey(4)
    post_f, _ = mod.apply(params, embed, action, is_first, key,
                          should_sample=False, method="observe")
    post_g, _ = gen.apply(params, embed, action, is_first, key,
                          should_sample=False, method="observe")
    np.testing.assert_allclose(post_f["deter"], post_g["deter"], atol=1e-4)
    np.testing.assert_allclose(post_f["logit"], post_g["logit"], atol=1e-4)
