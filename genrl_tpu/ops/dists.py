"""Distribution toolkit for world-model and policy heads.

Pure-JAX, trace-friendly distribution objects covering the reference's zoo
(reference: agent/dreamer_utils.py:28-211 and DistLayer :787-841):
straight-through one-hot categoricals, two-hot symlog regression targets,
MSE/symlog "distributions", diagonal normals, squashed/truncated normals and
Bernoulli. Objects are ephemeral (constructed inside jit traces); sampling
takes explicit PRNG keys. Statistics are computed in float32 regardless of
the compute dtype for numerical robustness on bf16 TPU pipelines.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from genrl_tpu.ops.math import symlog, symexp

sg = jax.lax.stop_gradient


def _sum_last(x: jax.Array, n: int) -> jax.Array:
    if n == 0:
        return x
    return jnp.sum(x, axis=tuple(range(x.ndim - n, x.ndim)))


class DiagNormal:
    """Diagonal Gaussian; `event_dims` trailing dims form the event."""

    def __init__(self, mean, std, event_dims: int = 0):
        self._mean = jnp.asarray(mean, jnp.float32)
        self._std = jnp.asarray(std, jnp.float32)
        self.event_dims = event_dims

    @property
    def mean(self):
        return self._mean

    def mode(self):
        return self._mean

    @property
    def std(self):
        return self._std

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self._mean.shape
        eps = jax.random.normal(key, shape, dtype=self._mean.dtype)
        return self._mean + self._std * eps  # reparameterized

    def log_prob(self, x):
        x = jnp.asarray(x, jnp.float32)
        var = jnp.square(self._std)
        lp = -0.5 * (jnp.square(x - self._mean) / var + jnp.log(2 * jnp.pi * var))
        return _sum_last(lp, self.event_dims)

    def entropy(self):
        ent = 0.5 * jnp.log(2 * jnp.pi * jnp.e * jnp.square(self._std))
        return _sum_last(ent, self.event_dims)


def kl_normal(p: DiagNormal, q: DiagNormal) -> jax.Array:
    vp, vq = jnp.square(p._std), jnp.square(q._std)
    kl = 0.5 * ((vp + jnp.square(p._mean - q._mean)) / vq - 1.0) + jnp.log(q._std / p._std)
    return _sum_last(kl, p.event_dims)


class OneHotDist:
    """Straight-through one-hot categorical with a uniform mixture.

    probs = unif_mix * softmax(logits) + (1 - unif_mix) / K
    (reference: OneHotDist, agent/dreamer_utils.py:177-197). The last axis is
    the category axis; `independent_dims` extra trailing axes (before the
    category axis) are summed over in log_prob/entropy/kl — the RSSM uses
    independent_dims=1 over the 32 stochastic groups.
    """

    def __init__(self, logits, unif_mix: float = 0.99, independent_dims: int = 0):
        logits = jnp.asarray(logits, jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        k = logits.shape[-1]
        probs = unif_mix * probs + (1.0 - unif_mix) / k
        self.probs = probs
        self.logits = jnp.log(probs)  # normalized log-probs of the mixture
        self.independent_dims = independent_dims

    @property
    def mean(self):
        return self.probs

    def mode(self):
        m = jax.nn.one_hot(jnp.argmax(self.logits, axis=-1), self.logits.shape[-1])
        # straight-through: gradient flows into the (normalized) logits
        return sg(m) + self.logits - sg(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.logits.shape[:-1]
        idx = jax.random.categorical(key, jnp.broadcast_to(self.logits, shape + self.logits.shape[-1:]))
        onehot = jax.nn.one_hot(idx, self.logits.shape[-1], dtype=self.probs.dtype)
        probs = jnp.broadcast_to(self.probs, onehot.shape)
        return sg(onehot) + probs - sg(probs)  # ST gradients through probs

    def log_prob(self, x):
        lp = jnp.sum(jnp.asarray(x, jnp.float32) * self.logits, axis=-1)
        return _sum_last(lp, self.independent_dims)

    def entropy(self):
        ent = -jnp.sum(self.probs * self.logits, axis=-1)
        return _sum_last(ent, self.independent_dims)


def kl_onehot(p: OneHotDist, q: OneHotDist) -> jax.Array:
    kl = jnp.sum(p.probs * (p.logits - q.logits), axis=-1)
    return _sum_last(kl, p.independent_dims)


def kl_divergence(p, q):
    if isinstance(p, OneHotDist) and isinstance(q, OneHotDist):
        return kl_onehot(p, q)
    if isinstance(p, DiagNormal) and isinstance(q, DiagNormal):
        return kl_normal(p, q)
    raise NotImplementedError(f"kl({type(p)}, {type(q)})")


class BernoulliDist:
    """ST Bernoulli over probs; used by the discount head (binary dist)."""

    def __init__(self, probs, event_dims: int = 0):
        probs = jnp.asarray(probs, jnp.float32)
        self.probs = jnp.clip(probs, 1e-7, 1 - 1e-7)
        self.event_dims = event_dims

    @property
    def mean(self):
        return self.probs

    def mode(self):
        return (self.probs > 0.5).astype(jnp.float32)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.probs.shape
        s = jax.random.bernoulli(key, jnp.broadcast_to(self.probs, shape)).astype(jnp.float32)
        probs = jnp.broadcast_to(self.probs, shape)
        return sg(s) + probs - sg(probs)

    def log_prob(self, x):
        x = jnp.asarray(x, jnp.float32)
        lp = x * jnp.log(self.probs) + (1.0 - x) * jnp.log1p(-self.probs)
        return _sum_last(lp, self.event_dims)

    def entropy(self):
        ent = -(self.probs * jnp.log(self.probs) + (1 - self.probs) * jnp.log1p(-self.probs))
        return _sum_last(ent, self.event_dims)


class MSEDist:
    """Deterministic "distribution" whose log_prob is the negative (summed or
    mean) squared error over the last `event_dims` axes
    (reference: MSEDist, agent/dreamer_utils.py:62-83)."""

    def __init__(self, mode, event_dims: int, agg: str = "sum"):
        self._mode = jnp.asarray(mode, jnp.float32)
        self.event_dims = event_dims
        self._agg = agg

    @property
    def mean(self):
        return self._mode

    def mode(self):
        return self._mode

    def log_prob(self, value):
        value = jnp.asarray(value, jnp.float32)
        assert self._mode.shape == value.shape, (self._mode.shape, value.shape)
        distance = jnp.square(self._mode - value)
        if self._agg == "mean":
            loss = jnp.mean(distance, axis=tuple(range(distance.ndim - self.event_dims, distance.ndim)))
        elif self._agg == "sum":
            loss = _sum_last(distance, self.event_dims)
        else:
            raise NotImplementedError(self._agg)
        return -loss


class SymlogDist:
    """Symlog-MSE regression head (reference: SymlogDist, dreamer_utils.py:85-118)."""

    def __init__(self, mode, event_dims: int, dist: str = "mse", agg: str = "sum", tol: float = 1e-8):
        self._mode = jnp.asarray(mode, jnp.float32)
        self.event_dims = event_dims
        self._dist = dist
        self._agg = agg
        self._tol = tol

    @property
    def mean(self):
        return symexp(self._mode)

    def mode(self):
        return symexp(self._mode)

    def log_prob(self, value):
        value = jnp.asarray(value, jnp.float32)
        assert self._mode.shape == value.shape, (self._mode.shape, value.shape)
        if self._dist == "mse":
            distance = jnp.square(self._mode - symlog(value))
        elif self._dist == "abs":
            distance = jnp.abs(self._mode - symlog(value))
        else:
            raise NotImplementedError(self._dist)
        distance = jnp.where(distance < self._tol, 0.0, distance)
        if self._agg == "mean":
            loss = jnp.mean(distance, axis=tuple(range(distance.ndim - self.event_dims, distance.ndim)))
        elif self._agg == "sum":
            loss = _sum_last(distance, self.event_dims)
        else:
            raise NotImplementedError(self._agg)
        return -loss


class TwoHotDist:
    """255-bucket two-hot distribution over symlog space in [-20, 20]
    (reference: TwoHotDist, agent/dreamer_utils.py:120-175). Used by the
    reward and critic heads; `mean` decodes back through symexp."""

    NUM_BUCKETS = 255

    def __init__(self, logits, low: float = -20.0, high: float = 20.0):
        logits = jnp.asarray(logits, jnp.float32)
        assert logits.shape[-1] == self.NUM_BUCKETS, logits.shape
        self.logits = logits
        self.probs = jax.nn.softmax(logits, axis=-1)
        self.buckets = jnp.linspace(low, high, self.NUM_BUCKETS)

    @property
    def mean(self):
        wavg = jnp.sum(self.probs * self.buckets, axis=-1, keepdims=True)
        return symexp(wavg)

    def mode(self):
        return self.mean

    def log_prob(self, x):
        """x has a trailing singleton event axis (e.g. [..., 1])."""
        x = symlog(jnp.asarray(x, jnp.float32))
        n = self.NUM_BUCKETS
        below = jnp.sum((self.buckets <= x[..., None]).astype(jnp.int32), axis=-1) - 1
        above = n - jnp.sum((self.buckets > x[..., None]).astype(jnp.int32), axis=-1)
        below = jnp.clip(below, 0, n - 1)
        above = jnp.clip(above, 0, n - 1)
        equal = below == above
        dist_to_below = jnp.where(equal, 1.0, jnp.abs(self.buckets[below] - x))
        dist_to_above = jnp.where(equal, 1.0, jnp.abs(self.buckets[above] - x))
        total = dist_to_below + dist_to_above
        weight_below = dist_to_above / total
        weight_above = dist_to_below / total
        target = (
            jax.nn.one_hot(below, n) * weight_below[..., None]
            + jax.nn.one_hot(above, n) * weight_above[..., None]
        )
        log_pred = self.logits - jax.scipy.special.logsumexp(self.logits, axis=-1, keepdims=True)
        target = jnp.squeeze(target, axis=-2)  # collapse the singleton event axis
        return jnp.sum(target * log_pred, axis=-1)


class TruncNormalDist:
    """Clamped-sample truncated normal in [-1, 1] with ST clamping
    (reference: tools/utils.py:102-123 + DistLayer 'trunc_normal')."""

    def __init__(self, mean, std, low: float = -1.0, high: float = 1.0, eps: float = 1e-6, event_dims: int = 1):
        self._mean = jnp.asarray(mean, jnp.float32)
        self._std = jnp.asarray(std, jnp.float32)
        self.low, self.high, self.eps = low, high, eps
        self.event_dims = event_dims

    @property
    def mean(self):
        return self._mean

    def mode(self):
        return self._mean

    def _clamp(self, x):
        clamped = jnp.clip(x, self.low + self.eps, self.high - self.eps)
        return x - sg(x) + sg(clamped)

    def sample(self, key, sample_shape=(), stddev_clip=None):
        shape = tuple(sample_shape) + self._mean.shape
        eps = jax.random.normal(key, shape) * self._std
        if stddev_clip is not None:
            eps = jnp.clip(eps, -stddev_clip, stddev_clip)
        return self._clamp(self._mean + eps)

    def log_prob(self, x):
        return DiagNormal(self._mean, self._std, self.event_dims).log_prob(x)

    def entropy(self):
        return DiagNormal(self._mean, self._std, self.event_dims).entropy()


class SquashedNormal:
    """tanh(Normal) with analytic log-det correction
    (reference: tools/utils.py:126-170). Statistics beyond mean use sampling,
    mirroring the reference's SampleDist wrapper (dreamer_utils.py:28-60)."""

    def __init__(self, mean, std, event_dims: int = 1, samples: int = 100):
        self._mean = jnp.asarray(mean, jnp.float32)
        self._std = jnp.asarray(std, jnp.float32)
        self.event_dims = event_dims
        self._samples = samples

    @property
    def mean(self):
        return jnp.tanh(self._mean)

    def mode(self):
        return jnp.tanh(self._mean)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self._mean.shape
        eps = jax.random.normal(key, shape)
        return jnp.tanh(self._mean + self._std * eps)

    def _base_log_prob(self, pre_tanh):
        return DiagNormal(self._mean, self._std, 0).log_prob(pre_tanh)

    def log_prob(self, y):
        y = jnp.clip(jnp.asarray(y, jnp.float32), -1 + 1e-6, 1 - 1e-6)
        x = jnp.arctanh(y)
        # log|d tanh(x)/dx| = 2 (log 2 - x - softplus(-2x))
        ldj = 2.0 * (math.log(2.0) - x - jax.nn.softplus(-2.0 * x))
        lp = self._base_log_prob(x) - ldj
        return _sum_last(lp, self.event_dims)

    def entropy(self, key=None):
        # Monte-Carlo entropy like the reference's SampleDist.entropy
        key = key if key is not None else jax.random.PRNGKey(0)
        eps = jax.random.normal(key, (self._samples,) + self._mean.shape)
        x = self._mean + self._std * eps
        y = jnp.tanh(x)
        ldj = 2.0 * (math.log(2.0) - x - jax.nn.softplus(-2.0 * x))
        lp = _sum_last(self._base_log_prob(x) - ldj, self.event_dims)
        return -jnp.mean(lp, axis=0)
