"""NPZ episode replay buffer with a prefetching device feed.

TPU-native rebuild of the reference replay plane (tools/replay.py:36-318).
Same on-disk episode grammar — `{idx}-{timestamp}-{uuid}-{len}.npz`, compressed
NPZ with keys observation/is_first/is_last/is_terminal/action/reward/discount
[, clip_video, clip_img] — so reference datasets (e.g. data/stickman_example)
load verbatim.

Design differences from the reference:
  * Sampling is vectorized numpy (one gather per batch), not a per-item
    torch IterableDataset; a background thread keeps a bounded queue of
    ready host batches so NPZ decode and batch assembly overlap TPU compute
    (SURVEY.md §7 hard part (d)).
  * Images are delivered HWC (TPU conv layout); the stored CHW uint8 of the
    reference format is transposed during batch assembly.
  * `as_sharded` pins batches onto a jax.sharding.Sharding (data-parallel
    batch axis over the mesh) via jax.device_put on the host thread.
"""

from __future__ import annotations

import collections
import datetime
import io
import queue
import threading
import traceback
import uuid as uuidlib
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

# episode-corruption sentinel an env process can emit (reference: replay.py:18)
SIG_FAILURE = "failure_signal"


def episode_len(episode: Dict[str, np.ndarray]) -> int:
    # subtract one for the dummy first transition (reference: replay.py:31-33)
    return next(iter(episode.values())).shape[0] - 1


def save_episode(episode: Dict[str, np.ndarray], directory: Path, idx: int) -> Path:
    """Write `{idx}-{ts}-{uuid}-{len}.npz` atomically-ish via an in-memory
    buffer (reference: save_episode, tools/replay.py:238-250)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    ts = datetime.datetime.now().strftime("%Y%m%dT%H%M%S")
    name = f"{idx}-{ts}-{uuidlib.uuid4().hex}-{episode_len(episode)}.npz"
    path = directory / name
    with io.BytesIO() as bs:
        np.savez_compressed(bs, **episode)
        bs.seek(0)
        with path.open("wb") as f:
            f.write(bs.read())
    return path


def normalize_episode(episode: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Canonicalize per-key shapes to the reference NPZ schema: reward and
    discount carry a trailing singleton event dim — reward(T,1), discount(T,1)
    (reference fixture data/stickman_example; SURVEY.md §2.6). Episodes
    collected by wrappers that emit scalar rewards would otherwise stack to
    (T,) and break twohot heads expecting [..., 1] targets."""
    out = dict(episode)
    for k in ("reward", "discount"):
        v = out.get(k)
        if v is not None and v.ndim == 1:
            out[k] = v[:, None]
    return out


def load_episode(path: Path) -> Dict[str, np.ndarray]:
    """Load one episode. Uses the native C++ reader (thread-pooled inflate,
    GIL released — native/npz_reader.cc) when built; numpy otherwise. The
    win scales with host core count (TPU hosts have 100+; this is a no-op
    on single-core machines)."""
    try:
        from genrl_tpu.data import native

        if native.available():
            return normalize_episode(native.load_episode_native(path))
    except Exception:
        pass
    with Path(path).open("rb") as f:
        data = np.load(f)
        return normalize_episode({k: data[k] for k in data.files})


def parse_filename(path: Path):
    """-> (idx, timestamp_str, uuid, length) (reference: tools/replay.py:262-281)."""
    parts = Path(path).stem.split("-")
    idx = int(parts[0])
    ts = parts[1]
    uid = parts[2]
    length = int(parts[3])
    return idx, ts, uid, length


def count_episodes(directory: Path):
    """-> (num_episodes, num_transitions) from filenames alone."""
    paths = list(Path(directory).glob("*.npz"))
    lengths = [parse_filename(p)[3] for p in paths]
    return len(paths), sum(lengths)


def _convert(value: np.ndarray) -> np.ndarray:
    """Dtype normalization (reference: tools/replay.py:300-308)."""
    if np.issubdtype(value.dtype, np.floating):
        return value.astype(np.float32)
    if np.issubdtype(value.dtype, np.signedinteger):
        return value.astype(np.int32)
    if np.issubdtype(value.dtype, np.uint8):
        return value.astype(np.uint8)
    if np.issubdtype(value.dtype, np.bool_):
        return value.astype(bool)
    return value


class ReplayBuffer:
    """In-RAM episode store with FIFO capacity eviction, uniform
    (episode, time-crop) sampling and an optional prefetch thread.

    Mirrors the reference semantics (tools/replay.py:36-236): episodes are
    dicts of [T+1, ...] arrays including the dummy reset transition; sampling
    returns [B, L, ...] windows with `is_first` forced on the crop head when
    the crop starts at the episode head.
    """

    def __init__(
        self,
        data_specs=None,
        meta_specs=(),
        directory: Optional[Path] = None,
        length: int = 48,
        capacity: int = 0,
        ongoing: bool = False,
        minlen: int = 1,
        maxlen: int = 0,
        prioritize_ends: bool = False,
        device=None,
        load_first: bool = False,
        load_recursive: bool = False,
        image_hwc: bool = True,
        seed: int = 0,
    ):
        self._directory = Path(directory) if directory is not None else None
        self._length = length
        self._capacity = int(capacity)
        self._ongoing = ongoing
        self._minlen = minlen
        self._maxlen = maxlen
        self._prioritize_ends = prioritize_ends
        self._image_hwc = image_hwc
        self._rng = np.random.default_rng(seed)
        self._episodes: "collections.OrderedDict[str, Dict[str, np.ndarray]]" = collections.OrderedDict()
        self._ongoing_eps: Dict[str, Dict[str, list]] = collections.defaultdict(
            lambda: collections.defaultdict(list)
        )
        self._total_episodes = 0
        self._total_steps = 0
        self._loaded_episodes = 0
        self._loaded_steps = 0
        self._batch_size = None
        self._queue = None
        self._workers = []
        # called with every completed (converted) episode — the collector
        # attaches a DeviceRing upload here
        self.on_episode = None
        if self._directory is not None and self._directory.exists():
            self._load(self._directory, load_recursive)

    # ---- loading -----------------------------------------------------------
    def _load(self, directory: Path, recursive: bool):
        pattern = "**/*.npz" if recursive else "*.npz"
        paths = sorted(directory.glob(pattern))
        for path in paths:
            try:
                episode = load_episode(path)
            except Exception as e:  # torn file — skip (reference behavior)
                print(f"replay: could not load {path}: {e}")
                continue
            self._add_episode(str(path), episode)
        self._total_episodes = len(self._episodes)
        self._total_steps = self._loaded_steps

    def _add_episode(self, key: str, episode: Dict[str, np.ndarray]):
        length = episode_len(episode)
        if length < max(1, self._minlen - 1):
            return
        episode = {k: _convert(v) for k, v in episode.items()}
        self._episodes[key] = episode
        self._loaded_episodes += 1
        self._loaded_steps += length
        # FIFO eviction by capacity in transitions (reference: replay.py:204-209)
        if self._capacity:
            while self._loaded_episodes > 1 and self._loaded_steps > self._capacity:
                oldest, ep = next(iter(self._episodes.items()))
                self._loaded_steps -= episode_len(ep)
                self._loaded_episodes -= 1
                del self._episodes[oldest]

    # ---- online adding -------------------------------------------------------
    def add(self, time_step, meta: Dict[str, np.ndarray] = (), env_id: int = 0):
        """Accumulate one step; flush to an episode on is_last
        (reference: ReplayBuffer.add, tools/replay.py:118-164)."""
        if isinstance(time_step, dict) and time_step.get(SIG_FAILURE, False):
            self._ongoing_eps[env_id].clear()
            return
        ep = self._ongoing_eps[env_id]
        for key, value in dict(time_step).items():
            if key == SIG_FAILURE:
                continue
            ep[key].append(np.asarray(value))
        if meta:
            for key, value in dict(meta).items():
                ep[key].append(np.asarray(value))
        if bool(np.asarray(time_step["is_last"]).any()):
            episode = {k: np.stack(v, 0) for k, v in ep.items()}
            ep.clear()
            self._store_episode(episode)

    def attach_key(self, key: str, values, env_id: int = 0):
        """Attach per-step `values` to the TAIL of the ongoing episode under
        `key`, zero-padding the head. values[i] aligns with ongoing step
        `T - len(values) + i` — the deferred-embedding backfill contract of
        the reference collector (collect_data.py:244-246), exposed as a
        public API instead of poking `_ongoing_eps` internals."""
        values = list(values)
        ep = self._ongoing_eps[env_id]
        steps = len(ep["is_first"])
        if len(values) > steps:
            raise ValueError(
                f"attach_key({key!r}): {len(values)} values for a "
                f"{steps}-step ongoing episode")
        pad = [np.zeros_like(np.asarray(values[0]))] * (steps - len(values))
        ep[key] = pad + [np.asarray(v) for v in values]

    def ongoing_len(self, env_id: int = 0) -> int:
        """Number of steps accumulated in the ongoing episode."""
        return len(self._ongoing_eps[env_id]["is_first"])

    def _store_episode(self, episode: Dict[str, np.ndarray]):
        length = episode_len(episode)
        if length < max(1, self._minlen - 1):
            return
        episode = {k: _convert(v) for k, v in normalize_episode(episode).items()}
        if self.on_episode is not None:
            self.on_episode(episode)
        self._total_episodes += 1
        self._total_steps += length
        if self._directory is not None:
            path = save_episode(episode, self._directory, self._total_episodes)
            self._add_episode(str(path), episode)
        else:
            self._add_episode(f"ep{self._total_episodes}", episode)

    # ---- stats ----------------------------------------------------------------
    @property
    def stats(self):
        return {
            "total_steps": self._total_steps,
            "total_episodes": self._total_episodes,
            "loaded_steps": self._loaded_steps,
            "loaded_episodes": self._loaded_episodes,
        }

    def __len__(self):
        return self._loaded_episodes

    def episodes(self):
        """Completed episodes, oldest first (public accessor)."""
        return list(self._episodes.values())

    def transform_key(self, key: str, fn):
        """Map `fn` over every loaded episode's `key` array in place (e.g.
        embedding whitening on `clip_video` before training)."""
        for ep in self._episodes.values():
            if key in ep:
                ep[key] = fn(ep[key])

    # ---- sampling ----------------------------------------------------------------
    def _sample_window(self, keys, length: int) -> Dict[str, np.ndarray]:
        names = list(self._episodes.keys())
        idx = self._rng.integers(0, len(names))
        episode = self._episodes[names[idx]]
        total = next(iter(episode.values())).shape[0]
        avail = total - length
        if avail < 0:
            # pad short episodes by repeating the last frame
            pad = -avail
            episode = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, 0)], 0) for k, v in episode.items()
            }
            avail = 0
        if self._prioritize_ends:
            upper = avail + 1
            start = min(self._rng.integers(0, upper + int(length)), avail)
        else:
            start = self._rng.integers(0, avail + 1)
        out = {}
        for k in keys:
            v = episode[k][start : start + length]
            out[k] = v
        # the crop is a fresh sequence start for the model
        if "is_first" in keys:
            isf = out["is_first"].copy()
            isf[0] = True
            out["is_first"] = isf
        return out

    def sample_batch(self, batch_size: int, length: Optional[int] = None, keys=None) -> Dict[str, np.ndarray]:
        """[B, L, ...] host batch; images transposed CHW->HWC when image_hwc."""
        if not self._episodes:
            raise RuntimeError("replay buffer is empty")
        length = length or self._length
        if keys is None:
            keys = list(next(iter(self._episodes.values())).keys())
        windows = [self._sample_window(keys, length) for _ in range(batch_size)]
        batch = {k: np.stack([w[k] for w in windows], 0) for k in keys}
        if self._image_hwc:
            for k, v in batch.items():
                if v.ndim == 5 and v.shape[2] in (1, 3) and v.dtype == np.uint8:
                    batch[k] = np.transpose(v, (0, 1, 3, 4, 2))
        return batch

    # ---- prefetching device feed ---------------------------------------------------
    def dataset(
        self,
        batch_size: int,
        length: Optional[int] = None,
        keys=None,
        sharding=None,
        prefetch: int = 3,
        num_workers: int = 1,
    ) -> Iterator:
        """Infinite iterator of device (or host, if sharding is None) batches.
        Worker threads assemble host batches; jax.device_put happens on the
        consumer side so XLA transfers overlap the next assembly."""
        import jax

        q: "queue.Queue" = queue.Queue(maxsize=prefetch)

        def worker():
            while True:
                try:
                    batch = self.sample_batch(batch_size, length, keys)
                except Exception:
                    traceback.print_exc()
                    continue
                q.put(batch)

        for _ in range(num_workers):
            t = threading.Thread(target=worker, daemon=True)
            t.start()
            self._workers.append(t)

        def gen():
            from genrl_tpu.parallel.mesh import put_process_local_batch

            while True:
                batch = q.get()
                if sharding is not None:
                    # multi-host: this process's batch is its local slice of
                    # the global sharded batch (each host samples from its
                    # own episode shard); single-host: plain device_put
                    batch = put_process_local_batch(batch, sharding)
                yield batch

        return gen()
