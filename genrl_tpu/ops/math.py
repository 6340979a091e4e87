"""Core scalar transforms and return computations.

TPU-native counterparts of the reference's math utilities
(reference: agent/dreamer_utils.py:13-26, 213-253). All time loops are
`jax.lax.scan`s over time-major arrays — the reference's Python loops
(`static_scan_for_lambda_return`, dreamer_utils.py:213-226) become a single
fused XLA reverse scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def symlog(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def signed_hyperbolic(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Signed hyperbolic transform, inverse of signed_parabolic."""
    return jnp.sign(x) * (jnp.sqrt(jnp.abs(x) + 1.0) - 1.0) + eps * x


def signed_parabolic(x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Signed parabolic transform, inverse of signed_hyperbolic."""
    z = jnp.sqrt(1.0 + 4.0 * eps * (eps + 1.0 + jnp.abs(x))) / (2 * eps) - 1.0 / (2 * eps)
    return jnp.sign(x) * (jnp.square(z) - 1.0)


def lambda_return(
    reward: jax.Array,
    value: jax.Array,
    pcont: jax.Array,
    bootstrap: jax.Array | None,
    lambda_: float,
) -> jax.Array:
    """TD(lambda) bootstrapped return over time-major sequences.

    reward/value/pcont: [T, ...]; bootstrap: [...] (value at step T).
    lambda_=1 gives a discounted Monte Carlo return, lambda_=0 a 1-step return.
    (reference semantics: agent/dreamer_utils.py:228-253, as a reverse lax.scan)
    """
    if not isinstance(pcont, jnp.ndarray) or pcont.ndim < reward.ndim:
        pcont = jnp.broadcast_to(pcont, reward.shape).astype(reward.dtype)
    if bootstrap is None:
        bootstrap = jnp.zeros_like(value[-1])
    next_values = jnp.concatenate([value[1:], bootstrap[None]], axis=0)
    inputs = reward + pcont * next_values * (1.0 - lambda_)

    def step(carry, x):
        inp, pc = x
        ret = inp + pc * lambda_ * carry
        return ret, ret

    _, returns = jax.lax.scan(step, bootstrap, (inputs, pcont), reverse=True)
    return returns


def global_norm(tree) -> jax.Array:
    """Global L2 norm of a pytree of arrays (for grad-norm metrics)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
