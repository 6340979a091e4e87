"""Device mesh construction and sharding rules.

The reference is strictly single-process single-GPU (SURVEY.md §2.10); scale
here comes from a jax.sharding.Mesh with a `data` axis (batch sharding over
ICI) and an optional `model` axis reserved for tensor-sharding the
InternVideo2 ViT. All train steps are jitted with explicit in/out shardings,
so XLA inserts the psum for gradient reduction automatically — the TPU
equivalent of the NCCL all-reduce the reference never had.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, (data, model, n)
    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh):
    """Place a host batch with the leading (batch) axis sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.device_put(batch, sh)


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh (DP layout). Large models
    (InternVideo2 6B) can swap in a rule-based partitioner later."""
    return jax.device_put(params, replicated(mesh))


def data_parallel_shardings(mesh: Mesh, state_like, batch_like):
    """(state_sharding, batch_sharding) pytrees for jit in_shardings."""
    rep = replicated(mesh)
    sh = batch_sharding(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: rep, state_like)
    batch_sh = jax.tree_util.tree_map(lambda _: sh, batch_like)
    return state_sh, batch_sh
