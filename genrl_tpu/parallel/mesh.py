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


def honor_platform_env() -> None:
    """Make `JAX_PLATFORMS=cpu <cli>` actually run on CPU. Deployments may
    register a hardware PJRT plugin from sitecustomize at interpreter start;
    once that import has happened, the env var alone no longer wins and only
    `jax.config` does — so a CPU-forced CLI run would silently (or, with the
    hardware link down, hangingly) still target the plugin. Call this at the
    top of every CLI main()."""
    import os

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host entry point (SURVEY §2.10 comm-backend row): one jax
    process per host, all chips of the pod/slice joined into one global
    device set. Must run before any other jax call; a no-op when the runtime
    is already initialized or single-process (args all None + no cluster env
    autodetection). On TPU pods the arguments are usually autodetected from
    the environment and can stay None."""
    if getattr(initialize_distributed, "_done", False):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    initialize_distributed._done = True


def make_mesh(data: int = -1, model: int = 1, dcn: int = 1, devices=None,
              zero1: bool = False) -> Mesh:
    """Build a (data, model) mesh — or (dcn, data, model) when `dcn > 1` for
    multi-slice pods (the scaling-book recipe: pure data parallelism over the
    slow DCN links, ICI-bound data/tensor sharding inside each slice). The
    batch is sharded over ("dcn", "data") jointly via `batch_axes`, so
    gradient psums reduce within a slice over ICI first and only the
    slice-summed gradients cross DCN. data=-1 uses all remaining devices.
    Under multi-process execution `jax.devices()` is the GLOBAL device set,
    so the mesh spans hosts.

    `zero1` is accepted (and ignored) so callers can splat a full
    `cfg.mesh` dict — it is a *placement* flag consumed by
    `state_shardings`/`shard_state`, not a mesh axis."""
    del zero1
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * dcn) == 0, (n, model, dcn)
        data = n // (model * dcn)
    assert dcn * data * model <= n, (dcn, data, model, n)
    if dcn > 1:
        # order devices so the leading mesh axis is the slice boundary: mesh
        # rows then map to slices, and only the "dcn" collectives cross DCN
        devices = sorted(devices, key=lambda d: (getattr(d, "slice_index", 0)
                                                 or 0, d.id))
        devs = np.asarray(devices[: dcn * data * model]).reshape(dcn, data, model)
        return Mesh(devs, ("dcn", "data", "model"))
    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def batch_axes(mesh: Mesh) -> tuple:
    """Mesh axes the batch dimension shards over (("dcn", "data") on a
    multi-slice mesh, ("data",) otherwise)."""
    return (("dcn", "data") if "dcn" in mesh.axis_names else ("data",))


def data_size(mesh: Mesh) -> int:
    """Total batch-sharding ways (product of the batch axes' sizes)."""
    return int(np.prod([mesh.shape[a] for a in batch_axes(mesh)]))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the batch axes."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def chunk_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] chunk sharding: batch axes on dim 1 (fused_chunk's xs)."""
    return NamedSharding(mesh, P(None, batch_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_process_local_batch(batch, sharding: NamedSharding):
    """Place a host batch under `sharding`. Single-process: a plain
    device_put. Multi-process: each host contributes its LOCAL slice of the
    global batch via jax.make_array_from_process_local_data (the per-host
    replay shard feeds the per-host chips; the global array is assembled
    without any cross-host copy). Callers pass a local batch of size
    global_batch // jax.process_count()."""
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def shard_batch(batch: Dict[str, Any], mesh: Mesh):
    """Place a host batch with the leading (batch) axis sharded over `data`."""
    return put_process_local_batch(batch, batch_sharding(mesh))


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh (DP layout). Large models
    (InternVideo2 6B) can swap in a rule-based partitioner later."""
    return jax.device_put(params, replicated(mesh))


def _zero1_leaf_sharding(mesh: Mesh, x) -> NamedSharding:
    """Shard a single optimizer-state leaf over the batch axes along its
    largest evenly-divisible dimension; replicate scalars and indivisible
    shapes (biases, odd-sized heads). Partial coverage is the standard GSPMD
    ZeRO posture — the big Adam moments (the memory that matters) shard."""
    ways = data_size(mesh)
    shape = tuple(getattr(x, "shape", ()) or ())
    best = None
    for i, d in enumerate(shape):
        if d % ways == 0 and d >= ways and (best is None or d > shape[best]):
            best = i
    if best is None:
        return replicated(mesh)
    spec = [None] * len(shape)
    spec[best] = batch_axes(mesh)
    return NamedSharding(mesh, P(*spec))


def state_shardings(state_like, mesh: Mesh, zero1: bool = False):
    """Sharding pytree for an AgentState: replicated DP layout, or — with
    `zero1` — ZeRO-1 (reference lineage: the DeepSpeed ZeRO-1 config vendored
    unused with InternVideo2, multi_modality config `stage=1`; SURVEY §2.10).
    Every leaf under a dataclass field named `*_opt` (wm_opt, connector_opt,
    disag_opt, actor_opt, critic_opt — the Adam mu/nu moments) is sharded
    over the batch axes; params stay replicated. Under jit, GSPMD then
    reduce-scatters the gradients into the sharded moment update and
    all-gathers the parameter deltas — ZeRO-1 without any explicit
    collective code, the TPU equivalent of DeepSpeed's optimizer
    partitioning."""
    rep = replicated(mesh)
    if not zero1:
        return jax.tree_util.tree_map(lambda _: rep, state_like)

    def leaf(path, x):
        in_opt = any(
            isinstance(k, jax.tree_util.GetAttrKey) and k.name.endswith("_opt")
            for k in path)
        return _zero1_leaf_sharding(mesh, x) if in_opt else rep

    return jax.tree_util.tree_map_with_path(leaf, state_like)


def shard_state(state, mesh: Mesh, zero1: bool = False):
    """Place an AgentState on the mesh (see state_shardings)."""
    return jax.device_put(state, state_shardings(state, mesh, zero1))


def data_parallel_shardings(mesh: Mesh, state_like, batch_like):
    """(state_sharding, batch_sharding) pytrees for jit in_shardings."""
    rep = replicated(mesh)
    sh = batch_sharding(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: rep, state_like)
    batch_sh = jax.tree_util.tree_map(lambda _: sh, batch_like)
    return state_sh, batch_sh
