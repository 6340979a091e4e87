"""Pallas fused GRU rollout vs the XLA lax.scan oracle (values + VJP).

Runs in interpret mode on the CPU test mesh; the same code path compiles to
a real Mosaic kernel on TPU (ops/pallas/gru_scan.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrl_tpu.ops.pallas.gru_scan import gru_scan, gru_scan_reference, supported


def _inputs(T=5, B=16, K=128, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x_proj = (0.5 * jax.random.normal(ks[0], (T, B, 3 * K))).astype(dtype)
    mask = (jax.random.uniform(ks[1], (T, B)) > 0.2).astype(jnp.float32)
    deter0 = jax.random.normal(ks[2], (B, K))
    w = (jax.random.normal(ks[3], (K, 3 * K)) / np.sqrt(K)).astype(jnp.float32)
    g = 1.0 + 0.1 * jax.random.normal(ks[4], (3 * K,))
    b = 0.1 * jax.random.normal(ks[5], (3 * K,))
    return x_proj, mask, deter0, w, g, b


def test_supported_shapes():
    assert supported(256, 1024)
    assert supported(16, 128)
    assert not supported(7, 128)
    assert not supported(16, 100)


def test_forward_matches_reference():
    args = _inputs()
    out = gru_scan(*args)
    ref = gru_scan_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_btile_selection():
    from genrl_tpu.ops.pallas.gru_scan import _pick_btile

    assert _pick_btile(48) == 48     # reference pretrain batch: ONE tile
    assert _pick_btile(16) == 16
    assert _pick_btile(512) == 256   # true multi-tile beyond the 256 cap
    assert _pick_btile(7) is None


def test_forward_multiple_batch_tiles():
    # B=512 -> tile 256, TWO grid tiles (any B<=256 divisible by 8 is one)
    args = _inputs(T=3, B=512, K=128, seed=1)
    out = gru_scan(*args)
    ref = gru_scan_reference(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_grads_multiple_batch_tiles():
    """B=512 gives nb=2 batch tiles. Regression for the Mosaic lowering bug
    where the per-tile dg/db accumulators were (nb, K3) arrays with (1, K3)
    blocks (invalid whenever nb > 1); grads must also stay exact across
    tiles."""
    args = _inputs(T=4, B=512, K=128, seed=7)
    probe = jax.random.normal(jax.random.PRNGKey(11), (4, 512, 128))

    def loss(fn, *a):
        return jnp.sum(fn(*a) * probe)

    gk = jax.grad(lambda *a: loss(gru_scan, *a), argnums=(0, 2, 3, 4, 5))(*args)
    gr = jax.grad(lambda *a: loss(gru_scan_reference, *a),
                  argnums=(0, 2, 3, 4, 5))(*args)
    for a, b, n in zip(gk, gr, ["x_proj", "deter0", "w", "g", "b"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


@pytest.mark.parametrize("B", [48, 512])
def test_bwd_mosaic_lowering(B):
    """Lower (not run) the kernel VJP at production shapes on a real TPU
    backend — interpret mode skips Mosaic's block-mapping checks, so only
    lowering exposes invalid BlockSpecs. Skipped on the CPU test mesh.
    Abstract args: no HBM is touched."""
    if jax.default_backend() == "cpu":
        pytest.skip("needs a TPU backend for Mosaic lowering")
    T, K = 48, 1024
    S = jax.ShapeDtypeStruct
    args = (S((T, B, 3 * K), jnp.bfloat16), S((T, B), jnp.float32),
            S((B, K), jnp.float32), S((K, 3 * K), jnp.float32),
            S((3 * K,), jnp.float32), S((3 * K,), jnp.float32))
    f = jax.jit(jax.grad(lambda *a: jnp.sum(gru_scan(*a)),
                         argnums=(0, 2, 3, 4, 5)))
    f.lower(*args)  # raises on invalid block mappings


@pytest.mark.parametrize("argnum,name", [
    (0, "x_proj"), (2, "deter0"), (3, "w"), (4, "ln_scale"), (5, "ln_bias")])
def test_grads_match_reference(argnum, name):
    args = _inputs(T=4, B=16, K=128, seed=2)
    # weighted-sum loss exercises the cotangent at every (t, b)
    probe = jax.random.normal(jax.random.PRNGKey(9), (4, 16, 128))

    def loss(fn, *a):
        return jnp.sum(fn(*a) * probe)

    g_kernel = jax.grad(lambda *a: loss(gru_scan, *a), argnums=argnum)(*args)
    g_ref = jax.grad(lambda *a: loss(gru_scan_reference, *a), argnums=argnum)(*args)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4, err_msg=name)


def test_grads_with_full_reset_mask():
    """is_first mid-sequence cuts the gradient path through the carry."""
    x_proj, mask, deter0, w, g, b = _inputs(T=4, B=16, K=128, seed=3)
    mask = mask.at[2, :].set(0.0)  # hard reset at t=2 for every batch row

    gk = jax.grad(lambda d0: jnp.sum(
        gru_scan(x_proj, mask, d0, w, g, b) ** 2))(deter0)
    gr = jax.grad(lambda d0: jnp.sum(
        gru_scan_reference(x_proj, mask, d0, w, g, b) ** 2))(deter0)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=2e-4, atol=2e-4)


def test_grucell_step_seq_paths_agree():
    """GRUCell.step_seq: pallas branch (interpreted on CPU) == nn.scan branch,
    values and gradients, through the flax module."""
    from genrl_tpu.models.layers import GRUCell

    T, B, K = 4, 16, 128
    cell = GRUCell(K, norm=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x_proj = jax.random.normal(ks[0], (T, B, 3 * K))
    mask = jnp.ones((T, B), jnp.float32).at[2, :8].set(0.0)
    deter0 = jax.random.normal(ks[1], (B, K))
    params = cell.init(ks[2], x_proj, mask, deter0, method="step_seq")

    def run(p, use_pallas):
        return cell.apply(p, x_proj, mask, deter0, use_pallas, method="step_seq")

    np.testing.assert_allclose(np.asarray(run(params, True)),
                               np.asarray(run(params, False)),
                               rtol=1e-5, atol=1e-5)
    gp = jax.grad(lambda p: jnp.sum(run(p, True) ** 2))(params)
    gs = jax.grad(lambda p: jnp.sum(run(p, False) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b2: np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                                 rtol=2e-4, atol=2e-4), gp, gs)


def test_forward_and_grads_bf16_inputs():
    """Training runs the kernel with bf16 x_proj/weights (f32 params cast at
    the boundary); values and grads must track the XLA path at bf16
    tolerances."""
    x_proj, mask, deter0, w, g, b = _inputs(T=4, B=16, K=128, seed=4,
                                            dtype=jnp.bfloat16)
    out = gru_scan(x_proj, mask, deter0, w, g, b)
    ref = gru_scan_reference(x_proj, mask, deter0, w, g, b)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    gk = jax.grad(lambda ww: jnp.sum(gru_scan(x_proj, mask, deter0, ww, g, b) ** 2))(w)
    gr = jax.grad(lambda ww: jnp.sum(gru_scan_reference(x_proj, mask, deter0, ww, g, b) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), rtol=5e-2, atol=5e-1)
