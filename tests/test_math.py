import jax
import jax.numpy as jnp
import numpy as np

from genrl_tpu.ops import math as m


def test_symlog_roundtrip():
    x = jnp.array([-100.0, -1.0, 0.0, 0.5, 10.0, 1e4])
    np.testing.assert_allclose(m.symexp(m.symlog(x)), x, rtol=1e-4)


def test_symlog_values():
    np.testing.assert_allclose(m.symlog(jnp.array([0.0])), [0.0])
    np.testing.assert_allclose(m.symlog(jnp.array([jnp.e - 1])), [1.0], rtol=1e-6)
    np.testing.assert_allclose(m.symlog(jnp.array([-(jnp.e - 1)])), [-1.0], rtol=1e-6)


def test_signed_hyperbolic_roundtrip():
    x = jnp.array([-50.0, -2.0, 0.0, 3.0, 100.0])
    np.testing.assert_allclose(m.signed_parabolic(m.signed_hyperbolic(x)), x, rtol=1e-4, atol=1e-4)


def _lambda_return_numpy(reward, value, pcont, bootstrap, lam):
    T = reward.shape[0]
    next_values = np.concatenate([value[1:], bootstrap[None]], 0)
    inputs = reward + pcont * next_values * (1 - lam)
    returns = np.zeros_like(reward)
    last = bootstrap
    for t in reversed(range(T)):
        last = inputs[t] + pcont[t] * lam * last
        returns[t] = last
    return returns


def test_lambda_return_matches_reference_recursion(rng):
    T, B = 15, 4
    reward = rng.normal(size=(T, B, 1)).astype(np.float32)
    value = rng.normal(size=(T, B, 1)).astype(np.float32)
    pcont = np.full((T, B, 1), 0.99, np.float32)
    bootstrap = rng.normal(size=(B, 1)).astype(np.float32)
    expected = _lambda_return_numpy(reward, value, pcont, bootstrap, 0.95)
    got = m.lambda_return(jnp.array(reward), jnp.array(value), jnp.array(pcont), jnp.array(bootstrap), 0.95)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_lambda_return_monte_carlo_limit(rng):
    # lambda=1 => discounted MC return
    T, B = 8, 3
    reward = rng.normal(size=(T, B)).astype(np.float32)
    value = rng.normal(size=(T, B)).astype(np.float32)
    pcont = np.full((T, B), 0.9, np.float32)
    bootstrap = np.zeros((B,), np.float32)
    got = np.array(m.lambda_return(jnp.array(reward), jnp.array(value), jnp.array(pcont), jnp.array(bootstrap), 1.0))
    expected = np.zeros_like(reward)
    acc = np.zeros((B,), np.float32)
    for t in reversed(range(T)):
        acc = reward[t] + 0.9 * acc
        expected[t] = acc
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_lambda_return_scalar_pcont():
    T, B = 4, 2
    reward = jnp.ones((T, B))
    value = jnp.zeros((T, B))
    out = m.lambda_return(reward, value, 0.5, None, 0.95)
    assert out.shape == (T, B)
