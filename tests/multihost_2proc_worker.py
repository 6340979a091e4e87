"""Worker process for the TRUE 2-process multi-host test (SURVEY §2.10
comm-backend row; reference anchor: the NCCL init the vendored InternVideo2
stack carries unused, multi_modality/utils/distributed.py:96-119).

Launched twice by tests/test_multihost.py::test_two_process_train_step with
process_id 0/1. Each process owns 4 virtual CPU devices; jax.distributed
joins them into one 8-device global set (cross-process collectives ride
gloo — the CPU stand-in for ICI). Each process feeds only its LOCAL half of
the global batch through put_process_local_batch and runs the same jitted
DreamerAgent train step; the psum'd losses and updated params must match the
single-process 8-device run.

Usage: python tests/multihost_2proc_worker.py <process_id> <port> <out.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["USE_TF"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")


def main(process_id: int, port: int, out_path: str, steps: int = 2) -> None:
    from genrl_tpu.parallel import initialize_distributed

    initialize_distributed(f"127.0.0.1:{port}", num_processes=2,
                           process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    from genrl_tpu.agents.assembly import DreamerAgent
    from genrl_tpu.parallel import (batch_sharding, make_mesh,
                                    put_process_local_batch, shard_state)
    from tests.test_agents import ACT, OBS_SPACE, tiny_batch, tiny_cfg

    cfg = tiny_cfg()
    cfg.update_deep({"agent": {"name": "dreamer",
                               "grad_heads": ("decoder", "reward")}})
    agent = DreamerAgent(cfg, OBS_SPACE, ACT)
    # same seed in every process -> identical initial params (replicated)
    state = shard_state(agent.init(jax.random.PRNGKey(0)), mesh := make_mesh())

    # every process constructs the same GLOBAL batch deterministically, then
    # contributes only its local half (rows [pid*4, pid*4+4) of 8)
    global_batch = tiny_batch(np.random.default_rng(0), batch=8)
    local = {k: v[process_id * 4:(process_id + 1) * 4] for k, v in global_batch.items()}
    data = put_process_local_batch(local, batch_sharding(mesh))

    step = jax.jit(agent.train_step)
    for i in range(steps):
        state, metrics = step(state, data, jax.random.PRNGKey(10 + i))

    # fully-replicated outputs: every leaf is addressable from any process
    flat, _ = jax.tree_util.tree_flatten_with_path(state.wm_params)
    np.savez(
        out_path,
        model_loss=np.asarray(metrics["model_loss"]),
        **{jax.tree_util.keystr(p): np.asarray(l) for p, l in flat},
    )
    print(f"proc {process_id}: model_loss={float(metrics['model_loss']):.6f}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
