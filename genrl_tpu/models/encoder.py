"""Pixel/vector observation encoder.

TPU-native rebuild of the reference Encoder (agent/dreamer_utils.py:558-628):
a 4-layer stride-2 VALID conv stack (depth 48*2^i, kernel 4, channel-wise
LayerNorm + SiLU) over NHWC images plus an MLP branch for vector keys, with
regex key routing. Images enter NHWC (TPU-friendly); the replay layer
converts from the stored CHW uint8 on device.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from genrl_tpu.models.layers import NormLayer, NormedLinear, get_act
from genrl_tpu.ops.math import symlog


def encoder_cnn_keys(shapes: Dict[str, Tuple[int, ...]], pattern: str):
    return tuple(k for k, v in sorted(shapes.items()) if re.match(pattern, k) and len(v) == 3)


def encoder_mlp_keys(shapes: Dict[str, Tuple[int, ...]], pattern: str):
    return tuple(k for k, v in sorted(shapes.items()) if re.match(pattern, k) and len(v) == 1)


class Encoder(nn.Module):
    shapes: Any  # dict key -> shape (images are NHWC: (H, W, C))
    cnn_keys: str = r".*"
    mlp_keys: str = r".*"
    act: str = "SiLU"
    norm: str = "none"
    cnn_depth: int = 48
    cnn_kernels: Sequence[int] = (4, 4, 4, 4)
    mlp_layers: Sequence[int] = (400, 400, 400, 400)
    symlog_inputs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, data: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        cnn_keys = encoder_cnn_keys(dict(self.shapes), self.cnn_keys)
        mlp_keys = encoder_mlp_keys(dict(self.shapes), self.mlp_keys)
        key0 = (cnn_keys + mlp_keys)[0]
        batch_dims = data[key0].shape[: data[key0].ndim - len(dict(self.shapes)[key0])]
        flat = {
            k: data[k].reshape((-1,) + tuple(data[k].shape[len(batch_dims):]))
            for k in cnn_keys + mlp_keys
        }
        outputs = []
        if cnn_keys:
            x = jnp.concatenate([flat[k] for k in cnn_keys], -1).astype(self.dtype)
            act = get_act(self.act)
            for i, kernel in enumerate(self.cnn_kernels):
                depth = 2**i * self.cnn_depth
                x = nn.Conv(
                    depth,
                    (kernel, kernel),
                    strides=(2, 2),
                    padding="VALID",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"conv{i}",
                )(x)
                # channel-wise layernorm on NHWC == LayerNorm over the last axis
                x = NormLayer(self.norm, eps=1e-3, dtype=self.dtype, name=f"convnorm{i}")(x)
                x = act(x)
            # flatten in channel-first order to match the reference's embed
            # layout (dreamer_utils.py:620-623) — keeps converted reference
            # checkpoints' obs_out weights valid without permutation
            x = jnp.moveaxis(x, -1, -3)
            outputs.append(x.reshape(x.shape[:-3] + (-1,)))
        if mlp_keys:
            x = jnp.concatenate([flat[k] for k in mlp_keys], -1).astype(self.dtype)
            if self.symlog_inputs:
                x = symlog(x)
            for i, width in enumerate(self.mlp_layers):
                x = NormedLinear(width, norm=self.norm, act=self.act, dtype=self.dtype, name=f"mlp{i}")(x)
            outputs.append(x)
        out = jnp.concatenate(outputs, -1)
        return out.reshape(batch_dims + out.shape[1:])


def encoder_embed_dim(shapes, cnn_keys=r".*", mlp_keys=r".*", cnn_depth=48,
                      cnn_kernels=(4, 4, 4, 4), mlp_layers=(400, 400, 400, 400)) -> int:
    """Static embed-dim computation (replaces the reference's zero-forward probe,
    agent/dreamer.py:129-133)."""
    ck = encoder_cnn_keys(shapes, cnn_keys)
    mk = encoder_mlp_keys(shapes, mlp_keys)
    dim = 0
    if ck:
        h, w = shapes[ck[0]][0], shapes[ck[0]][1]
        for k in cnn_kernels:
            h = (h - k) // 2 + 1
            w = (w - k) // 2 + 1
        dim += h * w * (2 ** (len(cnn_kernels) - 1)) * cnn_depth
    if mk:
        dim += mlp_layers[-1]
    return dim
