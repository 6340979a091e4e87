import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrl_tpu.ops import dists as D


def test_onehot_probs_mixture():
    logits = jnp.array([[10.0, 0.0, 0.0, 0.0]])
    d = D.OneHotDist(logits)
    # mixture guarantees probability floor of 0.01/K
    assert float(d.probs.min()) >= 0.01 / 4 - 1e-9
    np.testing.assert_allclose(float(d.probs.sum()), 1.0, rtol=1e-6)


def test_onehot_sample_straight_through_grad():
    logits = jnp.zeros((2, 3, 4))

    def f(logits):
        d = D.OneHotDist(logits, independent_dims=1)
        s = d.sample(jax.random.PRNGKey(0))
        return jnp.sum(s * jnp.arange(4.0))

    g = jax.grad(f)(logits)
    assert np.abs(np.array(g)).sum() > 0  # gradient flows through probs


def test_onehot_log_prob_entropy_consistency():
    key = jax.random.PRNGKey(1)
    logits = jax.random.normal(key, (5, 32, 8))
    d = D.OneHotDist(logits, independent_dims=1)
    # entropy == -E[log_prob] for the exact distribution
    ent = d.entropy()
    # compute expected log-prob by enumeration over the category axis
    lp = jnp.einsum("bsk,bsk->bs", d.probs, d.logits).sum(-1)
    np.testing.assert_allclose(np.array(ent), -np.array(lp), rtol=1e-5)


def test_onehot_kl_self_zero():
    logits = jax.random.normal(jax.random.PRNGKey(2), (3, 4, 6))
    d = D.OneHotDist(logits, independent_dims=1)
    kl = D.kl_onehot(d, D.OneHotDist(logits, independent_dims=1))
    np.testing.assert_allclose(np.array(kl), 0.0, atol=1e-6)


def test_onehot_kl_positive():
    p = D.OneHotDist(jax.random.normal(jax.random.PRNGKey(3), (10, 4, 6)), independent_dims=1)
    q = D.OneHotDist(jax.random.normal(jax.random.PRNGKey(4), (10, 4, 6)), independent_dims=1)
    assert np.all(np.array(D.kl_onehot(p, q)) > -1e-6)


def test_normal_kl_analytic():
    p = D.DiagNormal(jnp.zeros((3,)), jnp.ones((3,)), event_dims=1)
    q = D.DiagNormal(jnp.ones((3,)), jnp.ones((3,)), event_dims=1)
    np.testing.assert_allclose(float(D.kl_normal(p, q)), 1.5, rtol=1e-6)


def test_twohot_mean_recovers_value():
    # put the two-hot encoding of symlog(5.0) into the logits -> mean ~ 5.0
    buckets = np.linspace(-20, 20, 255)
    from genrl_tpu.ops.math import symlog
    x = float(symlog(jnp.array(5.0)))
    below = int(np.sum(buckets <= x)) - 1
    above = below + 1
    wb = (buckets[above] - x) / (buckets[above] - buckets[below])
    logits = np.full((1, 255), -1e9, np.float32)
    logits[0, below] = np.log(wb) + 10
    logits[0, above] = np.log(1 - wb) + 10
    d = D.TwoHotDist(jnp.array(logits))
    np.testing.assert_allclose(float(d.mean[0, 0]), 5.0, rtol=1e-3)


def test_twohot_log_prob_peak_at_encoded_value():
    logits = jnp.zeros((4, 255))
    d = D.TwoHotDist(logits)
    x = jnp.full((4, 1), 3.0)
    lp = d.log_prob(x)
    assert lp.shape == (4,)
    # uniform logits -> log_prob == weighted sum of log(1/255)
    np.testing.assert_allclose(np.array(lp), np.log(1 / 255), rtol=1e-5)


def test_twohot_log_prob_prefers_correct_bucket():
    # learnable check: logits peaked at correct bucket give higher log_prob
    from genrl_tpu.ops.math import symlog
    buckets = np.linspace(-20, 20, 255)
    x = float(symlog(jnp.array(7.0)))
    idx = int(np.argmin(np.abs(buckets - x)))
    good = np.zeros((1, 255), np.float32); good[0, idx] = 10
    bad = np.zeros((1, 255), np.float32); bad[0, (idx + 100) % 255] = 10
    v = jnp.full((1, 1), 7.0)
    assert float(D.TwoHotDist(jnp.array(good)).log_prob(v)[0]) > float(D.TwoHotDist(jnp.array(bad)).log_prob(v)[0])


def test_mse_dist():
    mode = jnp.ones((2, 3, 4))
    d = D.MSEDist(mode, event_dims=2)
    val = jnp.zeros((2, 3, 4))
    np.testing.assert_allclose(np.array(d.log_prob(val)), -12.0 * np.ones((2,)), rtol=1e-6)


def test_symlog_dist_mode():
    d = D.SymlogDist(jnp.array([[1.0]]), event_dims=1)
    np.testing.assert_allclose(float(d.mode()[0, 0]), np.e - 1, rtol=1e-5)


def test_trunc_normal_sample_in_bounds():
    d = D.TruncNormalDist(jnp.zeros((100,)), jnp.full((100,), 5.0))
    s = d.sample(jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(s))) <= 1.0


def test_squashed_normal_log_prob_matches_change_of_variables():
    d = D.SquashedNormal(jnp.zeros((1,)), jnp.ones((1,)), event_dims=1)
    y = jnp.array([0.5])
    x = np.arctanh(0.5)
    base_lp = -0.5 * (x**2 + np.log(2 * np.pi))
    ldj = np.log(1 - 0.5**2)
    np.testing.assert_allclose(float(d.log_prob(y)), base_lp - ldj, rtol=1e-5)


def test_bernoulli_log_prob():
    d = D.BernoulliDist(jnp.array([0.75]), event_dims=1)
    np.testing.assert_allclose(float(d.log_prob(jnp.array([1.0]))), np.log(0.75), rtol=1e-5)


def test_sample_shapes():
    key = jax.random.PRNGKey(0)
    assert D.OneHotDist(jnp.zeros((2, 32, 32))).sample(key).shape == (2, 32, 32)
    assert D.DiagNormal(jnp.zeros((2, 3)), jnp.ones((2, 3))).sample(key).shape == (2, 3)
    assert D.SquashedNormal(jnp.zeros((2, 6)), jnp.ones((2, 6))).sample(key).shape == (2, 6)
