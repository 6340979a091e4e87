"""Latent -> observation decoder.

TPU-native rebuild of the reference Decoder (agent/dreamer_utils.py:631-715):
a linear 'conv_in' projection (embed -> 32*depth) feeding a 4-layer stride-2
VALID ConvTranspose stack (kernels 5,5,6,6: 1->5->13->30->64), NHWC, with
per-key image distributions, plus an MLP branch ending in DistHeads.

The `conv_in` projection is also the feature space used by GenRL's latent
reward similarity (reference: tools/genrl_utils.py:253-259), so it is exposed
as a standalone method.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from genrl_tpu.models.layers import DistHead, NormLayer, NormedLinear, get_act
from genrl_tpu.ops import dists as D


def decoder_cnn_keys(shapes, pattern):
    return tuple(k for k, v in sorted(shapes.items()) if re.match(pattern, k) and len(v) == 3)


def decoder_mlp_keys(shapes, pattern):
    return tuple(k for k, v in sorted(shapes.items()) if re.match(pattern, k) and len(v) == 1)


class Decoder(nn.Module):
    shapes: Any  # dict key -> shape (images NHWC)
    cnn_keys: str = r".*"
    mlp_keys: str = r".*"
    act: str = "SiLU"
    norm: str = "none"
    cnn_depth: int = 48
    cnn_kernels: Sequence[int] = (5, 5, 6, 6)
    mlp_layers: Sequence[int] = (400, 400, 400, 400)
    mlp_dist: str = "mse"
    image_dist: str = "mse"
    dtype: Any = jnp.float32

    def setup(self):
        self._cnn_keys = decoder_cnn_keys(dict(self.shapes), self.cnn_keys)
        self._mlp_keys = decoder_mlp_keys(dict(self.shapes), self.mlp_keys)
        if self._cnn_keys:
            self.conv_in = nn.Dense(32 * self.cnn_depth, dtype=self.dtype, param_dtype=jnp.float32)
            convs, norms = [], []
            channels = sum(dict(self.shapes)[k][-1] for k in self._cnn_keys)
            for i, kernel in enumerate(self.cnn_kernels):
                last = i == len(self.cnn_kernels) - 1
                depth = channels if last else 2 ** (len(self.cnn_kernels) - i - 2) * self.cnn_depth
                convs.append(
                    nn.ConvTranspose(
                        depth,
                        (kernel, kernel),
                        strides=(2, 2),
                        padding="VALID",
                        transpose_kernel=True,
                        dtype=self.dtype,
                        param_dtype=jnp.float32,
                        name=f"deconv{i}",
                    )
                )
                norms.append(NormLayer("none" if last else self.norm, eps=1e-3, dtype=self.dtype, name=f"denorm{i}"))
            self.convs, self.norms = convs, norms
        if self._mlp_keys:
            self.mlp_trunk = [
                NormedLinear(w, norm=self.norm, act=self.act, dtype=self.dtype, name=f"mlp{i}")
                for i, w in enumerate(self.mlp_layers)
            ]
            self.mlp_heads = {
                k: DistHead(shape=tuple(dict(self.shapes)[k]), dist=self.mlp_dist, dtype=self.dtype, name=f"dense_{k}")
                for k in self._mlp_keys
            }

    def conv_in_features(self, features):
        """First linear projection of the decoder; GenRL's reward feature space."""
        return self.conv_in(features.astype(self.dtype))

    def __call__(self, features) -> Dict[str, object]:
        outputs = {}
        if self._cnn_keys:
            x = self.conv_in(features.astype(self.dtype))
            x = x.reshape((-1, 1, 1, 32 * self.cnn_depth))
            act = get_act(self.act)
            for i, (conv, norm) in enumerate(zip(self.convs, self.norms)):
                x = conv(x)
                last = i == len(self.cnn_kernels) - 1
                if not last:
                    x = norm(x)
                    x = act(x)
            x = x.reshape(features.shape[:-1] + x.shape[1:])
            split_sizes = [dict(self.shapes)[k][-1] for k in self._cnn_keys]
            offsets = [sum(split_sizes[:i + 1]) for i in range(len(split_sizes) - 1)]
            means = jnp.split(x, offsets, axis=-1) if offsets else [x]
            for k, mean in zip(self._cnn_keys, means):
                if self.image_dist == "mse":
                    outputs[k] = D.MSEDist(mean.astype(jnp.float32), event_dims=3)
                elif self.image_dist == "normal_unit_std":
                    m = mean.astype(jnp.float32)
                    outputs[k] = D.DiagNormal(m, jnp.ones_like(m), event_dims=3)
                else:
                    raise NotImplementedError(self.image_dist)
        if self._mlp_keys:
            x = features.astype(self.dtype)
            for layer in self.mlp_trunk:
                x = layer(x)
            for k in self._mlp_keys:
                outputs[k] = self.mlp_heads[k](x)
        return outputs
