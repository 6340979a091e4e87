"""Pallas flash attention for the InternVideo2 ViT (TPU), with backward.

The reference reaches flash attention through the CUDA `flash_attn` package
(third_party/.../flash_attention_class.py:1-70, used by Attention._flash_attn
internvideo2.py:204-224). This is the TPU equivalent, and unlike round 1 it
is a true online-softmax flash attention with a custom VJP, so the CLIP can
be finetuned and sequence length is no longer VMEM-capped:

- **Small-N fast path** (npad <= EXACT_MAX_N): one query block vs the full
  K/V resident in VMEM, exact softmax in f32. At the ViT's N=2049 the whole
  K/V per (batch, head) is ~0.5 MB — loading it once per query block beats
  the streaming variant's extra bookkeeping.
- **Online path** (any N): K/V streamed in KBLOCK tiles over the innermost
  grid dimension with running (max, sum, acc) carried in VMEM scratch —
  the standard flash-attention recurrence; O(N) memory, no [N, N] tensor.
- **Backward**: two Pallas kernels recomputing the probabilities from the
  saved logsumexp — dK/dV accumulate over query blocks, dQ over key blocks
  (the FlashAttention-2 backward split). delta = rowsum(dO * O) is a cheap
  XLA reduction outside the kernels.

Sequence and head dims are zero-padded to lane multiples; padded keys are
masked to -inf in every kernel (forward and backward), padded head lanes
contribute zeros to the dot products, and padded query rows receive zero
cotangents — all exact.

On CPU (tests, host-side init) the kernels run in interpret mode, selected
by lowering platform so the same trace works under jax.default_device(cpu)
inside a TPU-backed process.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QBLOCK = 128
KBLOCK = 256
# npad at/below which the exact full-K/V kernel is used (K/V for one
# (batch, head) still fit VMEM comfortably: 2 * 4096 * 128 * 4B = 4 MB)
EXACT_MAX_N = 4096
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _compiler_params(*semantics):
    try:
        return pltpu.CompilerParams(dimension_semantics=semantics)
    except TypeError:  # older/newer field spelling — fall back to defaults
        return None


def _mask_padded_cols(scores, valid_n: int, col_offset=0):
    np_ = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, scores.ndim - 1) + col_offset
    return jnp.where(col < valid_n, scores, NEG_INF)


def _run(kernel, grid, in_specs, out_shape, out_specs, scratch_shapes, args,
         semantics=None):
    """pallas_call with platform-dependent interpret mode."""

    def call(interpret):
        def fn(*a):
            kw = {}
            if semantics is not None and not interpret:
                cp = _compiler_params(*semantics)
                if cp is not None:
                    kw["compiler_params"] = cp
            return pl.pallas_call(
                kernel, grid=grid, in_specs=in_specs, out_shape=out_shape,
                out_specs=out_specs, scratch_shapes=scratch_shapes,
                interpret=interpret, **kw)(*a)

        return fn

    return jax.lax.platform_dependent(*args, cpu=call(True), default=call(False))


# ---------------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------------


def _fwd_exact_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, valid_n):
    """One query block vs all keys, exact softmax. Blocks:
    q [1, QBLOCK, Dp], k/v [1, Np, Dp], o [1, QBLOCK, Dp], lse [1, QBLOCK]."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if valid_n < scores.shape[-1]:
        scores = _mask_padded_cols(scores, valid_n)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32) / l
    o_ref[0] = out.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _fwd_online_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                       m_scr, l_scr, acc_scr, *, scale, valid_n):
    """Streaming K/V tiles with the online-softmax recurrence. Grid is
    (bh, q_blocks, k_blocks) with the key axis innermost; (m, l, acc) live in
    VMEM scratch across key steps of one query block."""
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full(m_scr.shape, NEG_INF, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _mask_padded_cols(s, valid_n, col_offset=kb * k.shape[0])

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(kb == nk - 1)
    def _flush():
        o_ref[0] = (acc_scr[:] / l_new).astype(o_ref.dtype)
        lse_ref[0] = m_new + jnp.log(l_new)


def _forward(q, k, v, scale, valid_n):
    """q, k, v: [bh, npad, dpad] (already padded). Returns (o, lse) with
    o [bh, npad, dpad] in q.dtype and lse [bh, npad] f32."""
    bh, npad, dpad = q.shape
    nq = npad // QBLOCK
    lse_shape = jax.ShapeDtypeStruct((bh, npad, 1), jnp.float32)
    o_shape = jax.ShapeDtypeStruct((bh, npad, dpad), q.dtype)

    if npad <= EXACT_MAX_N:
        return _run(
            functools.partial(_fwd_exact_kernel, scale=scale, valid_n=valid_n),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, QBLOCK, dpad), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad, dpad), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npad, dpad), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=(o_shape, lse_shape),
            out_specs=(
                pl.BlockSpec((1, QBLOCK, dpad), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, QBLOCK, 1), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[],
            args=(q, k, v),
            semantics=("parallel", "parallel"),
        )

    nk = npad // KBLOCK
    return _run(
        functools.partial(_fwd_online_kernel, scale=scale, valid_n=valid_n),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, QBLOCK, dpad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KBLOCK, dpad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KBLOCK, dpad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=(o_shape, lse_shape),
        out_specs=(
            pl.BlockSpec((1, QBLOCK, dpad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QBLOCK, 1), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((QBLOCK, 128), jnp.float32),
            pltpu.VMEM((QBLOCK, 128), jnp.float32),
            pltpu.VMEM((QBLOCK, dpad), jnp.float32),
        ],
        args=(q, k, v),
        semantics=("parallel", "parallel", "arbitrary"),
    )


# ---------------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------------


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale, valid_n):
    """dK/dV for one key block, accumulated over query blocks (innermost)."""
    qb = pl.program_id(2)
    nqb = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_scr[:] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[:] = jnp.zeros(dv_scr.shape, jnp.float32)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _mask_padded_cols(s, valid_n, col_offset=pl.program_id(1) * k.shape[0])
    p = jnp.exp(s - lse)  # [QB, KB]
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)  # [QB, KB]
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32) * scale

    @pl.when(qb == nqb - 1)
    def _flush():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_scr, *, scale, valid_n):
    """dQ for one query block, accumulated over key blocks (innermost)."""
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        dq_scr[:] = jnp.zeros(dq_scr.shape, jnp.float32)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = _mask_padded_cols(s, valid_n, col_offset=kb * k.shape[0])
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dq_scr[:] = dq_scr[:] + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(kb == nkb - 1)
    def _flush():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _backward(q, k, v, o, lse, do, scale, valid_n):
    bh, npad, dpad = q.shape
    nq, nk = npad // QBLOCK, npad // KBLOCK
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)

    qspec = pl.BlockSpec((1, QBLOCK, dpad), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, KBLOCK, dpad), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, QBLOCK, 1), lambda b, j, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    dk, dv = _run(
        functools.partial(_bwd_dkv_kernel, scale=scale, valid_n=valid_n),
        grid=(bh, nk, nq),
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        out_specs=(
            pl.BlockSpec((1, KBLOCK, dpad), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KBLOCK, dpad), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((KBLOCK, dpad), jnp.float32),
            pltpu.VMEM((KBLOCK, dpad), jnp.float32),
        ],
        args=(q, k, v, do, lse, delta),
        semantics=("parallel", "parallel", "arbitrary"),
    )

    qspec2 = pl.BlockSpec((1, QBLOCK, dpad), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, KBLOCK, dpad), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    rowspec2 = pl.BlockSpec((1, QBLOCK, 1), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    dq = _run(
        functools.partial(_bwd_dq_kernel, scale=scale, valid_n=valid_n),
        grid=(bh, nq, nk),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowspec2, rowspec2],
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        out_specs=pl.BlockSpec((1, QBLOCK, dpad), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((QBLOCK, dpad), jnp.float32)],
        args=(q, k, v, do, lse, delta),
        semantics=("parallel", "parallel", "arbitrary"),
    )
    return dq, dk, dv


# ---------------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fa_padded(q, k, v, scale, valid_n):
    o, _ = _forward(q, k, v, scale, valid_n)
    return o


def _fa_padded_fwd(q, k, v, scale, valid_n):
    o, lse = _forward(q, k, v, scale, valid_n)
    return o, (q, k, v, o, lse)


def _fa_padded_bwd(scale, valid_n, res, g):
    q, k, v, o, lse = res
    return _backward(q, k, v, o, lse, g, scale, valid_n)


_fa_padded.defvjp(_fa_padded_fwd, _fa_padded_bwd)


@functools.partial(jax.jit, static_argnames=("scale",))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float | None = None) -> jax.Array:
    """q, k, v: [B, H, N, D] -> [B, H, N, D]. Exact (non-causal) attention,
    differentiable (custom VJP with Pallas forward and backward kernels)."""
    B, H, N, D = q.shape
    scale = float(scale) if scale is not None else 1.0 / math.sqrt(D)
    # always a multiple of both block sizes so the backward kernels tile exactly
    npad = _round_up(N, max(QBLOCK, KBLOCK))
    dpad = _round_up(D, 128)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, npad - N), (0, dpad - D)))

    qp = pad(q).reshape(B * H, npad, dpad)
    kp = pad(k).reshape(B * H, npad, dpad)
    vp = pad(v).reshape(B * H, npad, dpad)
    out = _fa_padded(qp, kp, vp, scale, N)
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
