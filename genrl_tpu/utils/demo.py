"""Demonstration-window loading for target_from=posterior behavior runs.

A demo window is the .npz sibling of a video prompt written by
scripts/make_video_prompt.py: (observation, action, is_first[, reward])
arrays for the prompt's source slice. `load_demo_window` slices it to the
imag-horizon length around the best-reward start so the target trajectory
matches the imagined rollout length (used by train.py's behavior phase and
scripts/diag_behavior.py, which must score against the SAME target the
policy trained on).

Environment-gated variant of video_video_reward's target path (reference:
tools/genrl_utils.py:372-409); see GenRLAgent.make_posterior_target.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_demo_window(path: str, T: int) -> Dict[str, np.ndarray]:
    """Load a demo npz and slice to the T-step window with the highest
    summed reward (falling back to the head when no reward is stored).
    Returns numpy arrays: observation [T,H,W,C] uint8, action [T,A],
    is_first [T] bool with is_first[0]=True."""
    with np.load(path) as d:
        demo = {k: np.asarray(d[k]) for k in ("observation", "action", "is_first")}
        reward = np.asarray(d["reward"]).reshape(-1) if "reward" in d else None
    obs = demo["observation"]
    if obs.shape[1] in (1, 3) and obs.shape[-1] not in (1, 3):
        demo["observation"] = obs.transpose(0, 2, 3, 1)  # CHW -> HWC
    n = demo["is_first"].shape[0]
    if n > T:
        if reward is not None and reward.shape[0] == n:
            csum = np.concatenate([[0.0], np.cumsum(reward)])
            start = int(np.argmax(csum[T:] - csum[:-T]))
        else:
            start = 0
        demo = {k: v[start:start + T] for k, v in demo.items()}
        demo["is_first"] = demo["is_first"].copy()
        demo["is_first"][0] = True
    return demo
