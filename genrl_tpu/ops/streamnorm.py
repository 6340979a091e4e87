"""Streaming reward normalizers as pure state-passing functions.

TPU-native equivalents of the reference's stateful normalizers
(reference: StreamNorm agent/dreamer_utils.py:934-1001, RewardEMA :1014-1029).
State lives in the agent's train-state pytree so the whole update stays
inside one jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StreamNormState(NamedTuple):
    mag: jax.Array       # EMA of |x| mean, shape = `shape`
    mean: jax.Array      # EMA of mean, scalar
    square_mean: jax.Array
    step: jax.Array      # int32 update counter (0 => uninitialized)


def stream_norm_init(shape=()) -> StreamNormState:
    return StreamNormState(
        mag=jnp.ones(shape, jnp.float32),
        mean=jnp.zeros((), jnp.float32),
        square_mean=jnp.zeros((), jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


def stream_norm(
    state: StreamNormState,
    inputs: jax.Array,
    momentum: float = 0.99,
    scale: float = 1.0,
    eps: float = 1e-8,
    shape=(),
):
    """Returns (outputs, new_state, metrics). momentum=1 disables normalization."""
    x = jnp.asarray(inputs, jnp.float32)
    batch = x.reshape((-1,) + tuple(shape))
    mag = jnp.mean(jnp.abs(batch), axis=0)
    mean = jnp.mean(batch)
    square_mean = jnp.mean(batch * batch)
    first = state.step == 0
    ema = lambda old, new: jnp.where(first, new, momentum * old + (1 - momentum) * new)
    new_state = StreamNormState(
        mag=jax.lax.stop_gradient(ema(state.mag, mag)),
        mean=jax.lax.stop_gradient(ema(state.mean, mean)),
        square_mean=jax.lax.stop_gradient(ema(state.square_mean, square_mean)),
        step=state.step + 1,
    )
    metrics = {"mean": jnp.mean(x), "std": jnp.std(x)}
    if momentum == 1:
        outputs = x
    else:
        values = batch / (new_state.mag[None] + eps) * scale
        outputs = values.reshape(x.shape)
    metrics["normed_mean"] = jnp.mean(outputs)
    metrics["normed_std"] = jnp.std(outputs)
    return outputs, new_state, metrics


def reward_ema(x: jax.Array, ema_vals: jax.Array, alpha: float = 1e-2):
    """DreamerV3 return normalization: 5%/95% quantile EMA -> (offset, scale,
    new_ema_vals). `ema_vals` has shape (2,)."""
    flat = jax.lax.stop_gradient(jnp.asarray(x, jnp.float32).flatten())
    quantiles = jnp.quantile(flat, jnp.array([0.05, 0.95]))
    new_ema = alpha * quantiles + (1 - alpha) * ema_vals
    scale = jnp.clip(new_ema[1] - new_ema[0], min=1.0)
    offset = new_ema[0]
    return jax.lax.stop_gradient(offset), jax.lax.stop_gradient(scale), new_ema
