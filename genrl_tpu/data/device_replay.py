"""Device-resident replay: the episode store lives in HBM and batch windows
are gathered INSIDE the jitted train step.

The reference streams every batch host->device (tools/replay.py:223-236 +
DataLoader). On TPU that H2D hop is the throughput ceiling whenever the
interconnect is slower than the model step (measured: 13.6ms compute vs
107ms transfer for a 16x16 stickman batch on one v5e chip). When the dataset
fits in HBM — 20M uint8 frames @ 64x64x3 ~= 245 GB is too big, but typical
pretraining replays (hundreds of episodes) are a few GB — the TPU-native
answer is to upload episodes ONCE and fold uniform (episode, time-crop)
sampling into the XLA program: one gather feeding the encoder directly, zero
steady-state host traffic. Falls back to the streaming ReplayBuffer when the
dataset exceeds `max_bytes`.

Sampling semantics match ReplayBuffer: uniform episode index, uniform start
in [0, len - L], is_first forced on the crop head.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DeviceReplay:
    """Padded episode arrays on device + a pure `sample(arrays, key)` fn."""

    def __init__(self, directory: Path, length: int, keys=None, minlen: int = 1,
                 sharding=None, max_bytes: float = 8e9, image_hwc: bool = True,
                 load_recursive: bool = True, transforms=None):
        from genrl_tpu.data.replay import load_episode

        self.length = int(length)
        pattern = "**/*.npz" if load_recursive else "*.npz"
        paths = sorted(Path(directory).glob(pattern))
        episodes = []
        total = 0
        for p in paths:
            try:
                ep = load_episode(p)
            except Exception:
                continue
            T = next(iter(ep.values())).shape[0]
            if T < max(minlen, length):
                continue
            episodes.append(ep)
            total += sum(v.nbytes for v in ep.values())
        if not episodes:
            raise ValueError(f"no usable episodes in {directory}")
        if total > max_bytes:
            raise MemoryError(
                f"dataset is {total/1e9:.1f} GB > max_bytes={max_bytes/1e9:.1f} GB; "
                "use the streaming ReplayBuffer")
        if keys is None:
            # schema = the majority key set; episodes missing any of its keys
            # (e.g. clip_video on a partially-embedded dataset) are skipped
            # LOUDLY rather than crashing the load or silently dropping the
            # key for everyone
            from collections import Counter

            counts = Counter(frozenset(ep.keys()) for ep in episodes)
            majority = max(counts, key=lambda s: (counts[s], len(s)))
            keep = [ep for ep in episodes if majority <= set(ep.keys())]
            if len(keep) < len(episodes):
                missing = sorted({k for ep in episodes
                                  if not (majority <= set(ep.keys()))
                                  for k in majority - set(ep.keys())})
                print(f"device replay: skipping {len(episodes) - len(keep)} "
                      f"episode(s) missing schema key(s) "
                      f"{missing} (partial dataset?)")
            episodes = keep
            keys = sorted(majority)
        self.keys = [k for k in keys if k in episodes[0]]
        self.num_episodes = len(episodes)
        tmax = max(next(iter(ep.values())).shape[0] for ep in episodes)
        self.lengths = np.array([next(iter(ep.values())).shape[0] for ep in episodes], np.int32)

        arrays: Dict[str, np.ndarray] = {}
        for k in self.keys:
            v0 = episodes[0][k]
            shape = (len(episodes), tmax) + v0.shape[1:]
            buf = np.zeros(shape, v0.dtype)
            for i, ep in enumerate(episodes):
                v = ep[k]
                buf[i, : v.shape[0]] = v
            if image_hwc and buf.ndim == 5 and buf.shape[2] in (1, 3) and buf.dtype == np.uint8:
                buf = np.transpose(buf, (0, 1, 3, 4, 2))
            if transforms and k in transforms:
                # host-side per-key transform (e.g. embedding whitening) runs
                # on the padded [N, Tmax, ...] buffer before the one-time
                # device upload; padding rows are all-zero by construction
                buf = transforms[k](buf)
            arrays[k] = buf

        put = (lambda x: jax.device_put(x, sharding)) if sharding is not None else jax.device_put
        self.arrays = {k: put(v) for k, v in arrays.items()}
        self.ep_len = put(self.lengths)

    # ---- pure sampling (call inside jit) -------------------------------------
    def sample(self, key: jax.Array, batch_size: int) -> Dict[str, jax.Array]:
        return sample_windows(self.arrays, self.ep_len, key, batch_size, self.length)

    @property
    def stats(self):
        return {
            "loaded_episodes": self.num_episodes,
            "loaded_steps": int(self.lengths.sum() - self.num_episodes),
        }


class DeviceRing:
    """Online device-resident episode ring for the collector.

    The streaming collector feed uploads a full [B, L] host batch per train
    call (~10 MB for 16x50 64px uint8 — on a remote-TPU link that upload
    dominates the train call). The ring instead uploads each episode ONCE at
    episode end into fixed [capacity, maxlen] HBM buffers and fuses window
    sampling into the train jit (`sample_windows` with n_valid), so a train
    call ships only scalars. FIFO overwrite past `capacity` episodes — the
    same eviction the reference's bounded buffer performs (tools/replay.py),
    just with the recency horizon set by `capacity * maxlen` frames.
    """

    def __init__(self, capacity: int, maxlen: int, length: int,
                 image_hwc: bool = True, keys=None):
        self.capacity = int(capacity)
        self.maxlen = int(maxlen)
        self.length = int(length)
        self.image_hwc = image_hwc
        # optional key filter: episodes may carry extras (e.g. clip_video on
        # some but not all episodes of a mixed buffer); the ring tracks only
        # the keys the trainer samples, keeping slot schemas homogeneous
        self.keys = tuple(keys) if keys is not None else None
        self.arrays: Optional[Dict[str, jax.Array]] = None
        self.ep_len = jnp.zeros((self.capacity,), jnp.int32)
        self.cursor = 0          # next slot to overwrite
        self.count = 0           # filled slots (<= capacity)
        self.total_episodes = 0

        def _ingest(arrays, ep_len, slot, length, ep):
            out = {k: jax.lax.dynamic_update_slice(
                v, ep[k].astype(v.dtype),
                (slot,) + (0,) * (v.ndim - 1)) for k, v in arrays.items()}
            return out, ep_len.at[slot].set(length)

        # donate the ring buffers: the update happens in place in HBM
        self._ingest = jax.jit(_ingest, donate_argnums=(0, 1))

    def _prep(self, episode: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        out = {}
        if self.keys is not None:
            missing = [k for k in self.keys if k not in episode]
            if missing:
                raise ValueError(f"episode missing ring keys {missing}")
            episode = {k: episode[k] for k in self.keys}
        # add_episode derives the slot's valid length from the FIRST key; a
        # ragged episode would silently zero-fill inside the sampled window
        lens = {k: np.asarray(v).shape[0] for k, v in episode.items()}
        if len(set(lens.values())) > 1:
            raise ValueError(f"ragged episode (per-key lengths differ): {lens}")
        for k, v in episode.items():
            v = np.asarray(v)
            if (self.image_hwc and v.ndim == 4 and v.shape[1] in (1, 3)
                    and v.dtype == np.uint8):
                v = np.transpose(v, (0, 2, 3, 1))
            T = min(v.shape[0], self.maxlen)
            buf = np.zeros((1, self.maxlen) + v.shape[1:], v.dtype)
            buf[0, :T] = v[:T]
            out[k] = buf
        return out

    def add_episode(self, episode: Dict[str, np.ndarray]):
        """Upload one completed [T, ...] episode into the next ring slot."""
        T = min(next(iter(episode.values())).shape[0], self.maxlen)
        if T < self.length:
            return  # shorter than a training window — skip, like minlen
        ep = self._prep(episode)
        if self.arrays is None:
            self.arrays = {
                k: jnp.zeros((self.capacity,) + v.shape[1:], v.dtype)
                for k, v in ep.items()}
        if set(ep) != set(self.arrays):
            raise ValueError(
                f"episode keys {sorted(ep)} != ring keys {sorted(self.arrays)}")
        self.arrays, self.ep_len = self._ingest(
            self.arrays, self.ep_len, self.cursor, T, ep)
        self.cursor = (self.cursor + 1) % self.capacity
        self.count = min(self.count + 1, self.capacity)
        self.total_episodes += 1

    def __len__(self):
        return self.count

    @property
    def stats(self):
        return {"ring_episodes": self.count,
                "ring_total_episodes": self.total_episodes}


def sample_windows(arrays: Dict[str, jax.Array], ep_len: jax.Array, key: jax.Array,
                   batch_size: int, length: int, out_sharding=None,
                   n_valid: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Uniform (episode, start) batch gather; pure, jit/pjit-friendly.
    arrays: {k: [N, Tmax, ...]}, ep_len: [N] -> {k: [B, L, ...]}.
    `out_sharding` (e.g. NamedSharding(mesh, P('data'))) constrains the
    gathered batch so each device materializes only its batch shard.
    `n_valid` (traced scalar) restricts episode sampling to the first
    n_valid slots — the DeviceRing case where the ring is partially full."""
    k_ep, k_t = jax.random.split(key)
    n = ep_len.shape[0]
    ep_idx = jax.random.randint(k_ep, (batch_size,), 0,
                                n if n_valid is None else n_valid)
    avail = jnp.maximum(ep_len[ep_idx] - length, 0)
    u = jax.random.uniform(k_t, (batch_size,))
    start = (u * (avail + 1).astype(jnp.float32)).astype(jnp.int32)
    start = jnp.minimum(start, avail)
    t_idx = start[:, None] + jnp.arange(length)[None, :]  # [B, L]

    out = {}
    for k, v in arrays.items():
        # one fused gather: [B, L, ...] = v[ep_idx[b], t_idx[b, l]]
        w = v[ep_idx[:, None], t_idx]
        if out_sharding is not None:
            w = jax.lax.with_sharding_constraint(w, out_sharding)
        out[k] = w
    if "is_first" in out:
        head = jnp.zeros_like(out["is_first"]).at[:, 0].set(True)
        out["is_first"] = jnp.logical_or(out["is_first"], head)
    return out


def fused_chunk(agent_step, n: int, batch_size: int, length: int,
                base_key: jax.Array, gather_key: jax.Array,
                batch_sharding=None):
    """Build the K-step dispatch body shared by train.py and bench.py:
    `(state, step0, arrays, ep_len) -> (state, last_step_metrics)`.

    All `n` batch windows are gathered ONCE in the program prologue
    ([n*B, L] gather reshaped to [n, B, L]) and fed to a lax.scan as xs, and
    only the chunk's LAST step computes metrics — the lean scan body lets XLA
    dead-code-eliminate the metric reductions (grad norms, entropies, KL
    means) of the first n-1 steps. The r2 device profile measured 1.37 of
    5.03 ms/step in window sampling + metric bookkeeping; this removes that
    tail. Callers jit with donate_argnums=(0,); the episode store rides in as
    ARGUMENTS (closed-over jax arrays would be baked into the HLO as
    constants, and a multi-GB store blows the program apart).
    """

    def fused(s, step0, arrays, ep_len):
        k_gather = jax.random.fold_in(gather_key, step0)
        d_all = sample_windows(arrays, ep_len, k_gather, n * batch_size, length)
        d_all = jax.tree_util.tree_map(
            lambda x: x.reshape((n, batch_size) + x.shape[1:]), d_all)
        if batch_sharding is not None:
            d_all = jax.lax.with_sharding_constraint(
                d_all, jax.tree_util.tree_map(lambda _: batch_sharding, d_all))
        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
            step0 + jnp.arange(n))

        def body(s, x):
            d, k = x
            s, _ = agent_step(s, d, k)
            return s, None

        head = jax.tree_util.tree_map(lambda x: x[:-1], (d_all, keys))
        tail = jax.tree_util.tree_map(lambda x: x[-1], (d_all, keys))
        if n > 1:
            s, _ = jax.lax.scan(body, s, head)
        s, ms = agent_step(s, *tail)
        return s, jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), ms)

    return fused
