"""ViClipWrapper: per-step InternVideo2 video embeddings in the obs dict.

Rebuild of envs/main.py:468-584. Maintains a rolling n_frames buffer of
rendered frames; each step attaches `clip_video` (the embedding of the last
8 frames) to the obs. In accumulate mode the per-step forwards are deferred
and flushed in one batch at episode end (`process_accumulate`);
`process_episode` embeds a whole episode with sliding windows and a zero
head-pad (the process_dataset.py path). Embedding batches run through the
JAX ViCLIP (on-TPU resize/normalize + flash-attention ViT).
"""

from __future__ import annotations

from collections import deque

import numpy as np

from genrl_tpu.envs.spaces import BoxSpace


class ViClipWrapper:
    def __init__(self, env, hd_rendering: bool = False, clip=None,
                 models_root: str = "models", accumulate: bool = True):
        self._env = env
        if clip is None:
            from genrl_tpu.models.internvideo2 import get_global_instance

            clip = get_global_instance(models_root=models_root)
        self.clip = clip
        self.n_frames = clip.n_frames
        self.viclip_emb_dim = clip.viclip_emb_dim
        self.buffer = deque(maxlen=self.n_frames)
        self.accumulate = accumulate
        self.accumulate_buffer = []
        self.hd_rendering = hd_rendering

    # ---- rendering -------------------------------------------------------------
    def hd_render(self, obs):
        if not self.hd_rendering:
            return obs["observation"]
        render_kwargs = {**getattr(self, "_render_kwargs", {})}
        render_kwargs.update(width=224, height=224)
        return self._env.physics.render(**render_kwargs).transpose(2, 0, 1)

    # ---- embedding --------------------------------------------------------------
    def _embed(self, x: np.ndarray) -> np.ndarray:
        """x: [B, n_frames, C, H, W] uint8 -> [B, emb]."""
        return np.asarray(self.clip.get_vid_features(x), np.float32)

    def _embed_batched(self, windows: np.ndarray, batch: int) -> np.ndarray:
        """Embed [W, n_frames, C, H, W] windows in fixed-size batches with a
        2-deep dispatch pipeline: batch k+1's upload + launch overlaps the
        wait on batch k's result (jax dispatch is asynchronous — the sync
        point is the np.asarray readback, so never read a batch back before
        the next one is in flight). The ragged tail is padded to `batch` and
        sliced after, keeping one compiled executable for every batch."""
        total = windows.shape[0]
        pending = []
        chunks = []
        for start in range(0, total, batch):
            x = windows[start : start + batch]
            if x.shape[0] < batch:
                pad = np.zeros((batch - x.shape[0],) + x.shape[1:], x.dtype)
                x = np.concatenate([x, pad], axis=0)
            pending.append(self.clip.get_vid_features(x))
            if len(pending) >= 2:
                chunks.append(np.asarray(pending.pop(0), np.float32))
        chunks.extend(np.asarray(f, np.float32) for f in pending)
        return np.concatenate(chunks, axis=0)[:total]

    def clip_process(self, x, bypass=False):
        if len(self.buffer) == self.n_frames or bypass:
            if self.accumulate and not bypass:
                self.accumulate_buffer.append(x[0])
                return np.zeros(self.viclip_emb_dim, np.float32)
            return self._embed(x)
        return np.zeros(self.viclip_emb_dim, np.float32)

    def process_accumulate(self, process_at_once=4):
        """Flush deferred windows in batches -> (list of embeds, 'clip_video')
        (reference: envs/main.py:503-520; consumed by collect_data)."""
        if not self.accumulate_buffer:
            return [], "clip_video"
        x = np.stack(self.accumulate_buffer, axis=0)
        embeds = self._embed_batched(x, int(process_at_once))
        assert embeds.shape[0] == len(self.accumulate_buffer)
        self.accumulate_buffer = []
        return list(embeds), "clip_video"

    def process_episode(self, obs: np.ndarray, process_at_once=8) -> np.ndarray:
        """Whole-episode sliding-window embeddings with zero head-pad
        (reference: envs/main.py:522-544). obs: [T, C, H, W] uint8 -> [T, emb]."""
        T = obs.shape[0]
        n = self.n_frames
        windows = np.stack([obs[j : j + n] for j in range(T - n + 1)], axis=0)
        embeds = self._embed_batched(windows, int(process_at_once))
        pad = np.zeros((n - 1,) + embeds.shape[1:], embeds.dtype)
        embeds = np.concatenate([pad, embeds], axis=0)
        assert embeds.shape[0] == T
        return embeds

    # ---- env protocol -------------------------------------------------------------
    def _sequence(self):
        return np.expand_dims(np.stack(self.buffer, axis=0), axis=0)

    def step(self, action):
        ts, obs = self._env.step(action)
        self.buffer.append(self.hd_render(obs))
        obs["clip_video"] = self.clip_process(self._sequence())
        return ts, obs

    def reset(self):
        self.buffer = deque(maxlen=self.n_frames)
        ts, obs = self._env.reset()
        self.buffer.append(self.hd_render(obs))
        obs["clip_video"] = self.clip_process(self._sequence())
        return ts, obs

    @property
    def obs_space(self):
        space = dict(self._env.obs_space)
        space["clip_video"] = BoxSpace(-np.inf, np.inf, (self.viclip_emb_dim,),
                                       np.float32)
        return space

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return getattr(self._env, name)
