"""Flash attention kernel: exact small-N path, online-softmax streaming path,
and the custom-VJP backward — all property-tested against the XLA naive
implementation (reference semantics: flash_attn_varlen_qkvpacked_func,
/root/reference/third_party/.../flash_attention_class.py:1-70, non-causal,
no dropout). Runs in Pallas interpret mode on the CPU test mesh; the same
kernels compile on TPU (bench: scripts/bench_flash_attention.py)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import genrl_tpu.ops.pallas  # noqa: F401  (registers the submodule)

fa = sys.modules["genrl_tpu.ops.pallas.flash_attention"]


def _rand(shape, seed, scale=1.0):
    return np.float32(np.random.default_rng(seed).normal(size=shape) * scale)


def _grads(fn, q, k, v):
    def loss(q, k, v):
        w = jnp.cos(jnp.arange(q.shape[-1], dtype=jnp.float32))
        return jnp.sum(fn(q, k, v) * w)

    return jax.grad(loss, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k),
                                             jnp.asarray(v))


@pytest.mark.parametrize("n,d", [(130, 24), (256, 128), (513, 88)])
def test_exact_path_matches_naive(n, d):
    q, k, v = (_rand((2, 3, n, d), s) for s in range(3))
    ref = fa.naive_attention(q, k, v)
    out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_online_path_matches_naive(monkeypatch):
    monkeypatch.setattr(fa, "EXACT_MAX_N", 0)  # force streaming K/V tiles
    # spicy logits (scale 2) stress the running-max renormalization
    q, k, v = (_rand((2, 2, 301, 40), s, scale=2.0) for s in range(3))
    ref = fa.naive_attention(q, k, v)
    out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_grad_matches_naive_exact_path():
    q, k, v = (_rand((1, 2, 140, 32), s) for s in range(3))
    g_fa = _grads(fa.flash_attention, q, k, v)
    g_ref = _grads(fa.naive_attention, q, k, v)
    for name, a, b in zip("qkv", g_fa, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   err_msg=f"d{name}")


def test_grad_matches_naive_online_path(monkeypatch):
    monkeypatch.setattr(fa, "EXACT_MAX_N", 0)
    q, k, v = (_rand((1, 2, 303, 40), s, scale=2.0) for s in range(3))
    g_fa = _grads(fa.flash_attention, q, k, v)
    g_ref = _grads(fa.naive_attention, q, k, v)
    for name, a, b in zip("qkv", g_fa, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   err_msg=f"d{name}")


def test_bf16_forward():
    q, k, v = (_rand((1, 1, 150, 64), s) for s in range(3))
    out = fa.flash_attention(*(jnp.asarray(x, jnp.bfloat16) for x in (q, k, v)))
    assert out.dtype == jnp.bfloat16
    ref = fa.naive_attention(q, k, v)
    np.testing.assert_allclose(np.float32(np.asarray(out)), np.asarray(ref),
                               atol=0.1)


def test_custom_scale():
    q, k, v = (_rand((1, 2, 128, 32), s) for s in range(3))
    ref = fa.naive_attention(q, k, v, scale=0.5)
    out = fa.flash_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


@pytest.mark.slow
def test_long_sequence_online():
    """N beyond the exact-path VMEM threshold exercises the streaming kernel
    at its natural dispatch point (reference flash-attn supports arbitrary N)."""
    n = fa.EXACT_MAX_N + 128  # smallest N that naturally selects the online path
    q, k, v = (_rand((1, 1, n, 32), s) for s in range(3))
    ref = fa.naive_attention(q, k, v)
    out = fa.flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
