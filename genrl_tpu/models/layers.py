"""Shared neural-net building blocks (flax.linen).

TPU-native counterparts of the reference's nn layer zoo
(reference: agent/dreamer_utils.py:718-868 — MLP, GRUCell, DistLayer,
NormLayer, ImgChLayerNorm, get_act). Compute runs in `dtype` (bf16 by
default on TPU), parameters stay float32; distribution statistics are cast
to float32 inside the dist objects (ops/dists.py).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genrl_tpu.ops import dists as D

Dtype = Any


def get_act(name: str) -> Callable[[jax.Array], jax.Array]:
    if name in (None, "none", "Identity"):
        return lambda x: x
    table = {
        "SiLU": jax.nn.silu,
        "silu": jax.nn.silu,
        "ELU": jax.nn.elu,
        "elu": jax.nn.elu,
        "ReLU": jax.nn.relu,
        "relu": jax.nn.relu,
        "GELU": jax.nn.gelu,
        "gelu": jax.nn.gelu,
        "Tanh": jnp.tanh,
        "tanh": jnp.tanh,
        "Sigmoid": jax.nn.sigmoid,
    }
    if name not in table:
        raise NotImplementedError(name)
    return table[name]


class NormLayer(nn.Module):
    """'none' or 'layer' normalization (reference: NormLayer, dreamer_utils.py:844-859)."""

    norm: str = "none"
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.norm == "none":
            return x
        if self.norm == "layer":
            return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, param_dtype=jnp.float32)(x)
        raise NotImplementedError(self.norm)


class NormedLinear(nn.Module):
    """Linear -> Norm -> activation. Bias only together with norm, matching the
    reference convention `nn.Linear(..., bias=norm != 'none')`."""

    features: int
    norm: str = "none"
    act: str = "none"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.features,
            use_bias=(self.norm != "none"),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = NormLayer(self.norm, dtype=self.dtype)(x)
        return get_act(self.act)(x)


class GRUCell(nn.Module):
    """Fused-gate GRU with layernormed gate pre-activations and update bias -1
    (reference: GRUCell, agent/dreamer_utils.py:750-785).

    The reference computes Linear(concat(inputs, deter) -> 3*size) per step.
    Here the weight is split into an input part (`wx`) and a recurrent part
    (`wd`) — mathematically identical (concat @ W == x @ W_top + d @ W_bot) —
    so sequence rollouts with *known* inputs (posterior observe with
    single_obs_posterior, the connector's teacher-forced update) can hoist
    `project_input` over the whole [B, T] batch into ONE large MXU matmul and
    keep only the deter-dependent half inside the lax.scan (the cuDNN-style
    RNN pre-projection trick, TPU edition).
    """

    size: int
    norm: bool = True
    act: str = "Tanh"
    update_bias: float = -1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.wx = nn.Dense(3 * self.size, use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32, name="wx")
        self.wd = nn.Dense(3 * self.size, use_bias=not self.norm, dtype=self.dtype,
                           param_dtype=jnp.float32, name="wd")
        if self.norm:
            # eps matches the reference torch LayerNorm default (1e-5)
            self.ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                   param_dtype=jnp.float32, name="ln")

    def project_input(self, inputs):
        """Input half of the gate pre-activations; batchable over [B, T]."""
        return self.wx(inputs.astype(self.dtype))

    def step(self, x_proj, deter):
        """One recurrence step from a precomputed input projection."""
        parts = x_proj + self.wd(deter.astype(self.dtype))
        if self.norm:
            parts = self.ln(parts)
        reset, cand, update = jnp.split(parts, 3, -1)
        reset = jax.nn.sigmoid(reset)
        cand = get_act(self.act)(reset * cand)
        update = jax.nn.sigmoid(update + self.update_bias)
        return update * cand + (1 - update) * deter.astype(cand.dtype)

    def step_seq(self, x_proj, mask, deter0, use_pallas: bool = False):
        """Full T-step rollout from time-major projections.

        x_proj [T, B, 3*size], mask [T, B] (0 resets the carry, is_first),
        deter0 [B, size] -> deters [T, B, size] f32. On TPU with the default
        cell config this dispatches to the single-launch Pallas kernel
        (ops/pallas/gru_scan.py: recurrent weight stays VMEM-resident across
        steps instead of one HBM-read-per-step XLA while-loop); otherwise an
        nn.scan equivalent runs. Param creation always goes through the scan
        path (flax init)."""
        from genrl_tpu.ops.pallas.gru_scan import gru_scan, supported

        T, B = x_proj.shape[:2]
        if (use_pallas and self.norm and self.act == "Tanh"
                and self.update_bias == -1.0 and not self.is_initializing()
                and supported(B, self.size)):
            w = self.wd.variables["params"]["kernel"]
            g = self.ln.variables["params"]["scale"]
            b = self.ln.variables["params"]["bias"]
            return gru_scan(x_proj, mask, deter0.astype(jnp.float32), w, g, b)

        def body(mod, h, x):
            xp, m = x
            h = h * m[:, None]
            h = mod.step(xp, h).astype(jnp.float32)
            return h, h

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        _, hs = scan(self, deter0.astype(jnp.float32),
                     (x_proj, mask.astype(jnp.float32)))
        return hs

    def __call__(self, inputs, deter):
        return self.step(self.project_input(inputs), deter)


class DistHead(nn.Module):
    """Output head factory: linear projection(s) -> distribution object
    (reference: DistLayer, agent/dreamer_utils.py:787-841).

    `outscale=0.0` zero-initializes the projection, the reference's zero-init
    for reward/critic heads (agent/dreamer.py:143-145, 356-359).
    """

    shape: Sequence[int]
    dist: str = "mse"
    min_std: float = 0.1
    max_std: float = 1.0
    init_std: float = 0.0
    outscale: float | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shape = tuple(self.shape) if not isinstance(self.shape, int) else (self.shape,)
        size = int(np.prod(shape))
        if self.outscale == 0.0:
            kinit = nn.initializers.zeros
        elif self.outscale is not None:
            kinit = nn.initializers.variance_scaling(self.outscale, "fan_avg", "uniform")
        else:
            kinit = nn.initializers.lecun_normal()
        out = nn.Dense(size, kernel_init=kinit, dtype=self.dtype, param_dtype=jnp.float32, name="out")(x)
        out = out.reshape(x.shape[:-1] + shape)
        if self.dist in ("normal", "tanh_normal", "trunc_normal"):
            std = nn.Dense(size, dtype=self.dtype, param_dtype=jnp.float32, name="std")(x)
            std = std.reshape(x.shape[:-1] + shape).astype(jnp.float32)
        out = out.astype(jnp.float32)
        ev = len(shape)
        if self.dist == "mse":
            return D.MSEDist(out, event_dims=ev)
        if self.dist == "normal_unit_std":
            return D.DiagNormal(out, jnp.ones_like(out), event_dims=ev)
        if self.dist == "normal":
            mean = jnp.tanh(out)
            std = (self.max_std - self.min_std) * jax.nn.sigmoid(std + 2.0) + self.min_std
            return D.DiagNormal(mean, std, event_dims=ev)
        if self.dist == "binary":
            return D.BernoulliDist(jax.nn.sigmoid(out), event_dims=ev)
        if self.dist == "tanh_normal":
            mean = 5.0 * jnp.tanh(out / 5.0)
            std = jax.nn.softplus(std + self.init_std) + self.min_std
            return D.SquashedNormal(mean, std, event_dims=ev)
        if self.dist == "trunc_normal":
            mean = jnp.tanh(out)
            std = 2.0 * jax.nn.sigmoid((std + self.init_std) / 2.0) + self.min_std
            return D.TruncNormalDist(mean, std, event_dims=1)
        if self.dist == "onehot":
            return D.OneHotDist(out)
        if self.dist == "twohot":
            return D.TwoHotDist(out)
        if self.dist == "symlog_mse":
            return D.SymlogDist(out, event_dims=ev)
        raise NotImplementedError(self.dist)


class MLPHead(nn.Module):
    """N x (Dense, Norm, act) trunk + DistHead (reference: MLP,
    agent/dreamer_utils.py:718-747). `dist='twohot'` forces a 255-dim output."""

    shape: Sequence[int] | int
    layers: int = 4
    units: int = 512
    act: str = "SiLU"
    norm: str = "none"
    dist: str = "mse"
    min_std: float = 0.1
    max_std: float = 1.0
    init_std: float = 0.0
    outscale: float | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for i in range(self.layers):
            x = NormedLinear(self.units, norm=self.norm, act=self.act, dtype=self.dtype, name=f"dense{i}")(x)
        shape = (255,) if self.dist == "twohot" else self.shape
        return DistHead(
            shape=shape if not isinstance(shape, int) else (shape,),
            dist=self.dist,
            min_std=self.min_std,
            max_std=self.max_std,
            init_std=self.init_std,
            outscale=self.outscale,
            dtype=self.dtype,
            name="head",
        )(x)


class ResidualLinear(nn.Module):
    """Linear+Norm+act with residual projection (reference:
    agent/video_utils.py:8-25), used by the UNet aligner."""

    features: int
    norm: str = "layer"
    act: str = "SiLU"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = NormLayer(self.norm, dtype=self.dtype)(h)
        h = get_act(self.act)(h)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32, name="res_proj")(x)
        return h + x
