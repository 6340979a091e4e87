"""Stub demo backend returning canned videos (reference: demo/demo_test.py:1-22)
so the UI can be exercised without TPU/model weights."""

from __future__ import annotations

import numpy as np


class Text2Video:
    def get_prompt(self, prompt: str, duration: int = 16, out_path=None):
        video = np.random.uniform(0, 1, (1, duration, 64, 64, 3)).astype(np.float32)
        if out_path:
            from demo.t2v import save_video

            save_video(video[0], out_path)
        return video


class Video2Video(Text2Video):
    def get_video(self, video_path: str, duration: int = 16, out_path=None):
        return self.get_prompt("", duration, out_path)
