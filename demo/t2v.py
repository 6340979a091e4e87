"""Text/video -> imagined latent video -> decoded pixels.

Rebuild of the reference demo backend (demo/t2v.py:27-110): load a trained
GenRL snapshot + the InternVideo2 encoder, embed a prompt, roll the connector
prior and decode with the world-model decoder.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class Text2Video:
    def __init__(self, snapshot_dir, task: str = "stickman_walk",
                 models_root: str = "models", cfg_overrides=()):
        import jax

        from genrl_tpu.agents.assembly import GenRLAgent
        from genrl_tpu.configs import PRESETS, TRAIN_BASE
        from genrl_tpu.models.internvideo2 import get_global_instance
        from genrl_tpu.utils.checkpoint import SnapshotManager
        from genrl_tpu.utils.config import compose

        self.cfg = compose(PRESETS, TRAIN_BASE, [f"task={task}", *cfg_overrides])
        self.clip = get_global_instance(models_root=models_root)
        self.agent = GenRLAgent(self.cfg, {"observation": (64, 64, 3)},
                                act_dim=int(self.cfg.get("act_dim", 10)))
        template = self.agent.init(jax.random.PRNGKey(0))
        snap = SnapshotManager(Path(snapshot_dir))
        loaded = snap.load(template)
        if loaded is None:
            print("t2v: WARNING no snapshot found — using random weights")
            self.state = template
        else:
            self.state, _ = loaded
        self._key = jax.random.PRNGKey(42)

    def _next_key(self):
        import jax

        self._key, k = jax.random.split(self._key)
        return k

    def _decode(self, prior) -> np.ndarray:
        inp = self.agent.wm.apply(self.state.wm_params, prior, method="decoder_input")
        video = self.agent.wm.apply(self.state.wm_params, inp, method="decode")[
            "observation"].mean + 0.5
        return np.clip(np.asarray(video), 0, 1)

    def imagine_from_embed(self, embed: np.ndarray, duration: int = 16,
                           sample: bool = False) -> np.ndarray:
        """[E] embed -> [1, duration, H, W, 3] float video in [0, 1]
        (reference: Text2Video.get_prompt, demo/t2v.py:51-88)."""
        import jax.numpy as jnp

        n = self.agent.n_frames
        duration = max(n, (duration // n) * n)
        video_embed = jnp.broadcast_to(
            jnp.asarray(embed).reshape(1, 1, -1), (1, duration, embed.shape[-1]))
        prior = self.agent.connector.apply(
            self.state.connector_params, video_embed, self._next_key(),
            sample=sample, reset_every_n_frames=False, denoise=True,
            method="video_imagine")
        return self._decode(prior)

    def get_prompt(self, prompt: str, duration: int = 16,
                   out_path: str | None = None) -> np.ndarray:
        embed = self.clip.get_txt_feat(prompt)
        video = self.imagine_from_embed(embed, duration)
        if out_path:
            save_video(video[0], out_path)
        return video


class Video2Video(Text2Video):
    def get_video(self, video_path: str, duration: int = 16,
                  out_path: str | None = None) -> np.ndarray:
        embed = self.clip.get_vid_features_from_file(video_path)
        video = self.imagine_from_embed(embed, duration)
        if out_path:
            save_video(video[0], out_path)
        return video


def save_video(frames: np.ndarray, path: str, fps: int = 10):
    """[T, H, W, 3] float [0,1] -> mp4 (cv2)."""
    import cv2

    frames = (np.asarray(frames) * 255).astype(np.uint8)
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()
    return path
