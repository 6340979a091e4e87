"""Multi-process (multi-host) data-plane helpers (SURVEY §2.10).

True multi-host execution needs N coordinated jax processes; these tests pin
the single-process semantics of the helpers (put_process_local_batch must be
exactly device_put when process_count==1, and the make_array path must
assemble the same global array) so the multi-host branch shares its tested
assembly code with the single-host one.
"""

import jax
import jax.numpy as jnp
import numpy as np

from genrl_tpu.parallel import (
    batch_sharding,
    make_mesh,
    put_process_local_batch,
    shard_batch,
)


def test_put_process_local_batch_matches_device_put():
    mesh = make_mesh(data=8, model=1)
    sh = batch_sharding(mesh)
    batch = {"observation": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
             "reward": np.ones((8, 1), np.float32)}
    out = put_process_local_batch(batch, sh)
    ref = jax.device_put(batch, sh)
    for k in batch:
        assert out[k].sharding == ref[k].sharding
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


def test_make_array_from_process_local_data_assembly():
    """The multi-host assembly primitive produces the identical global array
    in the 1-process degenerate case (local slice == global batch)."""
    mesh = make_mesh(data=8, model=1)
    sh = batch_sharding(mesh)
    x = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
    arr = jax.make_array_from_process_local_data(sh, x)
    assert arr.shape == (16, 3)
    assert not arr.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(arr), x)
    # addressable shards tile the leading axis over the 8 data-axis devices
    sizes = sorted(s.data.shape[0] for s in arr.addressable_shards)
    assert sizes == [2] * 8


def test_shard_batch_feeds_jit_with_data_axis():
    mesh = make_mesh(data=8, model=1)
    batch = {"x": np.ones((8, 5), np.float32)}
    out = shard_batch(batch, mesh)
    s = jax.jit(lambda b: jnp.sum(b["x"]))(out)
    assert float(s) == 40.0
