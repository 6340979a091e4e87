"""Pallas TPU kernel: full-sequence fused GRU rollout (SURVEY.md §7.2's
"Pallas kernel #1").

The RSSM/connector scans (reference: static_scan over GRUCell,
agent/dreamer_utils.py:255-300,750-785) reduce — after input-projection
hoisting (models/rssm.py:_observe_fused) — to the recurrence

    h_t = GRU(x_proj[t] + h_{t-1} @ W_d)      (LN, reset/cand/update gates)

XLA compiles this as a while-loop with one tiny [B,K]x[K,3K] matmul per
iteration: each step re-reads the 12 MB recurrent weight from HBM and pays
the loop/launch latency, leaving the scan ~latency-bound (~7% MFU in-scan).
This kernel runs the WHOLE T-step rollout in ONE kernel launch with W_d
resident in VMEM across steps: the grid is (batch_tiles, T), the time
dimension iterates sequentially ("arbitrary" semantics) while the carry
lives in a VMEM scratch buffer, and only x_proj[t] streams in / h_t streams
out per step.

A custom VJP makes it a drop-in for training: the backward kernel walks the
grid in reverse, recomputes the gates from the saved h sequence (no extra
residuals beyond the forward outputs), carries dh in scratch, and emits
da = d(gate pre-activations) per step; the weight/LN-parameter gradients are
then two big batched MXU contractions OUTSIDE the kernel (dW = h_prevᵀ·da),
which XLA handles at full efficiency.

Semantics are pinned to the GRUCell defaults used everywhere in this
framework: LayerNorm(eps=1e-5) on the gate pre-activations, tanh candidate
activation, update_bias = -1 (reference: dreamer_utils.py:750-785).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genrl_tpu.ops.pallas.flash_attention import _compiler_params

LN_EPS = 1e-5
UPDATE_BIAS = -1.0


def _pick_btile(B: int, dtype=jnp.float32):
    # largest batch tile <=256 that divides B and satisfies Mosaic's
    # second-minor-dim tiling rule — NOT restricted to powers of two:
    # B=48 (the reference pretrain batch) runs as ONE 48-row tile instead of
    # three 16-row tiles whose M=16 matmuls underfill the 128x128 MXU.
    # The sublane tile is dtype-dependent ((8,128) f32, (16,128) bf16), so
    # bf16 inputs additionally require 16-divisible tiles — an 8-but-not-16
    # tile (B=24/40/56...) would pass this picker and then crash in Mosaic
    # lowering at compile time, the exact bug class the multi-tile fix closed
    div = 16 if jnp.dtype(dtype).itemsize < 4 else 8
    for bt in range(min(B, 256), div - 1, -1):
        if B % bt == 0 and bt % div == 0:
            return bt
    return None


def supported(B: int, K: int, dtype=jnp.float32) -> bool:
    """Shapes the kernel handles; callers fall back to the XLA scan else."""
    return _pick_btile(B, dtype) is not None and K % 128 == 0 and K > 0


def _call(kernel, grid, in_specs, out_shape, out_specs, scratch_shapes, args,
          semantics):
    def call(interpret):
        def fn(*a):
            kw = {}
            if not interpret:
                cp = _compiler_params(*semantics)
                if cp is not None:
                    kw["compiler_params"] = cp
            return pl.pallas_call(
                kernel, grid=grid, in_specs=in_specs, out_shape=out_shape,
                out_specs=out_specs, scratch_shapes=scratch_shapes,
                interpret=interpret, **kw)(*a)

        return fn

    return jax.lax.platform_dependent(*args, cpu=call(True), default=call(False))


def _gates(a, h_prev, g, b):
    """Shared forward math from pre-LN activations `a` [B, 3K] (f32).
    Returns (h_new, zn, r, c, u, inv_std)."""
    mu = jnp.mean(a, -1, keepdims=True)
    var = jnp.mean(jnp.square(a - mu), -1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    zn = (a - mu) * inv
    z = zn * g + b
    K = a.shape[-1] // 3
    r = jax.nn.sigmoid(z[:, :K])
    c = jnp.tanh(r * z[:, K : 2 * K])
    u = jax.nn.sigmoid(z[:, 2 * K :] + UPDATE_BIAS)
    h_new = u * c + (1.0 - u) * h_prev
    return h_new, zn, z, r, c, u, inv


# ---------------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------------


def _fwd_kernel(xp_ref, m_ref, h0_ref, w_ref, g_ref, b_ref, out_ref, h_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_ref[:] = h0_ref[:].astype(jnp.float32)

    h = h_ref[:] * m_ref[0].astype(jnp.float32)  # [BT, K] * [BT, 1]
    a = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
    h_new, *_ = _gates(a, h, g_ref[0].astype(jnp.float32),
                       b_ref[0].astype(jnp.float32))
    h_ref[:] = h_new
    out_ref[0] = h_new


def _fwd(x_proj, mask, deter0, w, g, b):
    T, B, K3 = x_proj.shape
    K = K3 // 3
    BT = _pick_btile(B, x_proj.dtype)
    grid = (B // BT, T)
    wc = w.astype(x_proj.dtype)  # bf16 weights when compute is bf16
    out = _call(
        _fwd_kernel, grid,
        in_specs=[
            pl.BlockSpec((1, BT, K3), lambda i, t: (t, i, 0)),
            pl.BlockSpec((1, BT, 1), lambda i, t: (t, i, 0)),
            pl.BlockSpec((BT, K), lambda i, t: (i, 0)),
            pl.BlockSpec((K, K3), lambda i, t: (0, 0)),
            pl.BlockSpec((1, K3), lambda i, t: (0, 0)),
            pl.BlockSpec((1, K3), lambda i, t: (0, 0)),
        ],
        out_shape=jax.ShapeDtypeStruct((T, B, K), jnp.float32),
        out_specs=pl.BlockSpec((1, BT, K), lambda i, t: (t, i, 0)),
        scratch_shapes=[pltpu.VMEM((BT, K), jnp.float32)],
        args=(x_proj, mask.reshape(T, B, 1).astype(jnp.float32),
              deter0, wc, g.reshape(1, K3), b.reshape(1, K3)),
        semantics=("arbitrary", "arbitrary"),
    )
    return out


# ---------------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------------


def _bwd_kernel(gout_ref, xp_ref, m_ref, hprev_ref, h0_ref, w_ref, g_ref,
                b_ref, da_ref, dh0_ref, dg_ref, db_ref, dh_ref, *, T):
    t = pl.program_id(1)
    rt = T - 1 - t

    @pl.when(t == 0)
    def _():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    K3 = xp_ref.shape[-1]

    gf = g_ref[0].astype(jnp.float32)
    bf = b_ref[0].astype(jnp.float32)
    m = m_ref[0].astype(jnp.float32)  # [BT, 1]
    h_raw = jnp.where(rt == 0, h0_ref[:].astype(jnp.float32),
                      hprev_ref[0].astype(jnp.float32))
    h_prev = h_raw * m
    # recompute forward at step rt
    a = xp_ref[0].astype(jnp.float32) + jnp.dot(
        h_prev.astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
    _, zn, z, r, c, u, inv = _gates(a, h_prev, gf, bf)

    dh = dh_ref[:] + gout_ref[0].astype(jnp.float32)
    du_pre = dh * (c - h_prev) * u * (1.0 - u)
    dc = dh * u
    one_m_c2 = 1.0 - c * c
    K = a.shape[-1] // 3
    dc_pre = dc * one_m_c2 * r
    dr = dc * one_m_c2 * z[:, K : 2 * K]
    dr_pre = dr * r * (1.0 - r)
    dz = jnp.concatenate([dr_pre, dc_pre, du_pre], axis=-1)
    # dg/db blocks are [1, 1, K3]: the per-batch-tile accumulators carry a
    # singleton middle axis so the block's LAST TWO dims equal the array's —
    # a 2-D (nb, K3) array with (1, K3) blocks fails Mosaic lowering whenever
    # nb > 1 (second-minor block dim must be 8-divisible or full)
    dg_ref[:] += jnp.sum(dz * zn, axis=0, keepdims=True).reshape(1, 1, K3)
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True).reshape(1, 1, K3)
    dzn = dz * gf
    da = (dzn - jnp.mean(dzn, -1, keepdims=True)
          - zn * jnp.mean(dzn * zn, -1, keepdims=True)) * inv
    da_ref[0] = da
    dh_raw = (dh * (1.0 - u) + jax.lax.dot_general(
        da.astype(w_ref.dtype), w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)) * m

    @pl.when(rt == 0)
    def _():
        dh0_ref[:] = dh_raw

    @pl.when(rt > 0)
    def _():
        dh_ref[:] = dh_raw


def _bwd(res, gout):
    x_proj, mask, deter0, w, g, b, deters = res
    T, B, K3 = x_proj.shape
    K = K3 // 3
    BT = _pick_btile(B, x_proj.dtype)
    nb = B // BT
    grid = (nb, T)
    mcol = mask.reshape(T, B, 1).astype(jnp.float32)
    wc = w.astype(x_proj.dtype)
    da, dh0, dg_t, db_t = _call(
        functools.partial(_bwd_kernel, T=T), grid,
        in_specs=[
            pl.BlockSpec((1, BT, K), lambda i, t: (T - 1 - t, i, 0)),   # gout
            pl.BlockSpec((1, BT, K3), lambda i, t: (T - 1 - t, i, 0)),  # x_proj
            pl.BlockSpec((1, BT, 1), lambda i, t: (T - 1 - t, i, 0)),   # mask
            pl.BlockSpec((1, BT, K),                                    # h_{t-1}
                         lambda i, t: (jnp.maximum(T - 2 - t, 0), i, 0)),
            pl.BlockSpec((BT, K), lambda i, t: (i, 0)),                 # deter0
            pl.BlockSpec((K, K3), lambda i, t: (0, 0)),                 # W
            pl.BlockSpec((1, K3), lambda i, t: (0, 0)),                 # g
            pl.BlockSpec((1, K3), lambda i, t: (0, 0)),                 # b
        ],
        out_shape=(
            jax.ShapeDtypeStruct((T, B, K3), jnp.float32),  # da
            jax.ShapeDtypeStruct((B, K), jnp.float32),      # d_deter0
            jax.ShapeDtypeStruct((nb, 1, K3), jnp.float32),  # dg per tile
            jax.ShapeDtypeStruct((nb, 1, K3), jnp.float32),  # db per tile
        ),
        out_specs=(
            pl.BlockSpec((1, BT, K3), lambda i, t: (T - 1 - t, i, 0)),
            pl.BlockSpec((BT, K), lambda i, t: (i, 0)),
            pl.BlockSpec((1, 1, K3), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, K3), lambda i, t: (i, 0, 0)),
        ),
        scratch_shapes=[pltpu.VMEM((BT, K), jnp.float32)],
        args=(gout.astype(jnp.float32), x_proj, mcol, deters, deter0, wc,
              g.reshape(1, K3), b.reshape(1, K3)),
        semantics=("arbitrary", "arbitrary"),
    )
    # weight grad as ONE batched MXU contraction outside the kernel:
    # dW[i,o] = sum_{t,b} h_prev_masked[t,b,i] * da[t,b,o]
    h_prev = jnp.concatenate([deter0[None].astype(jnp.float32),
                              deters[:-1]], 0) * mcol
    dw = jax.lax.dot_general(
        h_prev.reshape(T * B, K), da.reshape(T * B, K3),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return (da.astype(x_proj.dtype), jnp.zeros_like(mask),
            dh0.astype(deter0.dtype), dw.astype(w.dtype),
            dg_t.sum((0, 1)).astype(g.dtype), db_t.sum((0, 1)).astype(b.dtype))


# ---------------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------------


@jax.custom_vjp
def gru_scan(x_proj, mask, deter0, w, g, b):
    """Fused T-step GRU rollout.

    x_proj: [T, B, 3K] precomputed input projections (time-major)
    mask:   [T, B] carry reset mask (0 where is_first)
    deter0: [B, K] initial hidden state
    w:      [K, 3K] recurrent weight (f32 params; cast to x_proj dtype)
    g, b:   [3K] LayerNorm scale/bias
    Returns h: [T, B, K] f32 hidden-state sequence.
    """
    return _fwd(x_proj, mask, deter0, w, g, b)


def _fwd_vjp(x_proj, mask, deter0, w, g, b):
    h = _fwd(x_proj, mask, deter0, w, g, b)
    return h, (x_proj, mask, deter0, w, g, b, h)


gru_scan.defvjp(_fwd_vjp, _bwd)


def gru_scan_reference(x_proj, mask, deter0, w, g, b):
    """Pure-XLA lax.scan equivalent (correctness oracle for the kernel)."""

    wc = w.astype(x_proj.dtype)

    def step(h, x):
        xp, m = x
        h = h * m[:, None]
        a = xp.astype(jnp.float32) + jnp.dot(
            h.astype(wc.dtype), wc, preferred_element_type=jnp.float32)
        h_new, *_ = _gates(a, h, g.astype(jnp.float32), b.astype(jnp.float32))
        return h_new, h_new

    _, hs = jax.lax.scan(step, deter0.astype(jnp.float32),
                         (x_proj, mask.astype(jnp.float32)))
    return hs
