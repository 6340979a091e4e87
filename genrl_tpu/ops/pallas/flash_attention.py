"""Pallas flash attention for the InternVideo2 ViT (TPU).

The reference reaches flash attention through the CUDA `flash_attn` package
(third_party/.../flash_attention_class.py:1-70, used by Attention._flash_attn
internvideo2.py:204-224). This is the TPU equivalent: a query-blocked
attention kernel that never materializes the [N, N] score matrix in HBM.

Design for the ViT-1B workload (N = 8*(224/14)^2 + 1 = 2049 tokens, 16 heads
x head_dim 88): K/V for one (batch, head) fit comfortably in VMEM
(2176 x 128 x bf16 = 0.5 MB each), so each grid step loads one 128-row query
block plus the full K/V and computes an exact softmax over the key axis in
f32 on-chip — simpler than online-softmax tiling and exact. Sequence and
head dims are zero-padded to lane multiples; padded keys are masked to -inf,
padded head lanes contribute zeros to the dot products (exact).

Inference-only by design: GenRL keeps the CLIP frozen (SURVEY.md §2.9), so
no backward kernel is needed; training paths would add a custom VJP.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, valid_n: int):
    """One query block vs all keys. Block shapes:
    q [1, QBLOCK, Dp], k/v [1, Np, Dp], o [1, QBLOCK, Dp]."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [QBLOCK, Np]
    np_ = scores.shape[-1]
    if valid_n < np_:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_n, scores, -1e30)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None) -> jax.Array:
    """q, k, v: [B, H, N, D] -> [B, H, N, D]. Exact (non-causal) attention."""
    B, H, N, D = q.shape
    scale = float(scale) if scale is not None else 1.0 / math.sqrt(D)
    npad = _round_up(N, QBLOCK)
    dpad = _round_up(D, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, npad - N), (0, dpad - D)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    bh = B * H
    qp = qp.reshape(bh, npad, dpad)
    kp = kp.reshape(bh, npad, dpad)
    vp = vp.reshape(bh, npad, dpad)

    grid = (bh, npad // QBLOCK)

    def call(interpret):
        def fn(qp, kp, vp):
            return pl.pallas_call(
                functools.partial(_attn_kernel, scale=scale, valid_n=N),
                out_shape=jax.ShapeDtypeStruct((bh, npad, dpad), q.dtype),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, QBLOCK, dpad), lambda b, i: (b, i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, npad, dpad), lambda b, i: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, npad, dpad), lambda b, i: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, QBLOCK, dpad), lambda b, i: (b, i, 0),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
            )(qp, kp, vp)

        return fn

    # interpret mode on CPU (tests / host-side param init), compiled on TPU —
    # selected by LOWERING platform so the same trace works under
    # jax.default_device(cpu) within a TPU-backed process
    out = jax.lax.platform_dependent(qp, kp, vp, cpu=call(True), default=call(False))
    return out.reshape(B, H, npad, dpad)[:, :, :N, :D]


def naive_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None) -> jax.Array:
    """XLA reference implementation (materializes [N, N]); used for
    correctness diffing and as the CPU fallback."""
    D = q.shape[-1]
    scale = float(scale) if scale is not None else 1.0 / math.sqrt(D)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)
