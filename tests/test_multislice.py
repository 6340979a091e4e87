"""Multi-slice (dcn) mesh semantics on the virtual 8-device CPU mesh.

The scaling-book layout for multi-slice pods: pure data parallelism over the
slow DCN links, ICI-bound sharding inside each slice. `make_mesh(dcn>1)`
builds a (dcn, data, model) mesh and the batch shards over ("dcn", "data")
jointly, so gradient psums reduce over ICI within a slice before anything
crosses DCN. The full train step over this mesh runs in __graft_entry__'s
dryrun_multichip; this covers the mesh/sharding semantics in the unit suite.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genrl_tpu.parallel import (
    batch_axes,
    batch_sharding,
    chunk_batch_sharding,
    data_size,
    make_mesh,
    shard_batch,
    shard_params,
)


def test_dcn_mesh_shards_batch_over_both_axes():
    mesh = make_mesh(data=2, model=2, dcn=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert mesh.shape == {"dcn": 2, "data": 2, "model": 2}
    assert batch_axes(mesh) == ("dcn", "data")
    assert data_size(mesh) == 4

    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    xs = jax.device_put(x, batch_sharding(mesh))
    # 4-way batch sharding: each (dcn, data) coordinate owns 2 rows,
    # replicated over the model axis
    assert len({d.id for d in xs.sharding.device_set}) == 8
    shard_rows = {s.data.shape[0] for s in xs.addressable_shards}
    assert shard_rows == {2}

    # chunked [K, B, ...] layout shards dim 1 the same way
    k = jax.device_put(np.zeros((4, 8, 3), np.float32), chunk_batch_sharding(mesh))
    assert {s.data.shape for s in k.addressable_shards} == {(4, 2, 3)}


def test_dcn_mesh_gradient_reduction_runs():
    mesh = make_mesh(data=4, model=1, dcn=2)
    assert data_size(mesh) == 8
    params = shard_params({"w": jnp.ones((3,))}, mesh)
    data = shard_batch({"x": np.random.default_rng(0).normal(
        size=(8, 3)).astype(np.float32)}, mesh)

    @jax.jit
    def loss_grad(p, d):
        loss = lambda p: jnp.mean((d["x"] @ p["w"]) ** 2)
        return jax.grad(loss)(p)

    g = loss_grad(params, data)
    # grads of replicated params under a sharded batch: XLA inserts the
    # psum; the result is replicated and finite
    assert g["w"].sharding.is_fully_replicated
    assert np.isfinite(np.asarray(g["w"])).all()
