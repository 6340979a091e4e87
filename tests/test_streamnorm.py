import jax.numpy as jnp
import numpy as np

from genrl_tpu.ops.streamnorm import reward_ema, stream_norm, stream_norm_init


def test_stream_norm_momentum_one_is_identity():
    state = stream_norm_init()
    x = jnp.array([1.0, -2.0, 3.0])
    out, new_state, mets = stream_norm(state, x, momentum=1.0)
    np.testing.assert_allclose(np.array(out), np.array(x))
    assert int(new_state.step) == 1


def test_stream_norm_normalizes_magnitude():
    state = stream_norm_init()
    x = jnp.full((100,), 10.0)
    out, state, _ = stream_norm(state, x, momentum=0.0)
    np.testing.assert_allclose(np.array(out), 1.0, rtol=1e-5)


def test_stream_norm_first_step_initializes_ema():
    state = stream_norm_init()
    x = jnp.full((10,), 4.0)
    _, state, _ = stream_norm(state, x, momentum=0.99)
    # first call should set mag to batch mag, not blend with init value
    np.testing.assert_allclose(float(state.mag), 4.0, rtol=1e-6)


def test_reward_ema_offset_scale():
    x = jnp.linspace(0.0, 100.0, 1001)
    ema_vals = jnp.zeros((2,))
    offset, scale, new_ema = reward_ema(x, ema_vals, alpha=1.0)
    np.testing.assert_allclose(float(offset), 5.0, rtol=1e-2)
    np.testing.assert_allclose(float(scale), 90.0, rtol=1e-2)


def test_reward_ema_scale_floor():
    x = jnp.zeros((100,))
    offset, scale, _ = reward_ema(x, jnp.zeros((2,)), alpha=1.0)
    assert float(scale) == 1.0
