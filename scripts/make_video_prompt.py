"""Extract a video prompt from a replay buffer for video_video_reward.

Usage:
    python scripts/make_video_prompt.py <buffer_dir> <out.mp4> [window]

Scans the buffer's NPZ episodes (reference episode grammar,
tools/replay.py:252-298), picks the contiguous `window`-step slice with the
highest summed reward across all episodes, and writes its observations as an
mp4 — the same role the reference's TASK2VIDEO sample clips play
(tools/genrl_utils.py:96-103): a demonstration video whose InternVideo2
embedding drives behavior learning via video_video_reward.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def best_window(buffer_dir: Path, window: int):
    best = (-np.inf, None, 0)  # (score, file, start)
    for f in sorted(buffer_dir.glob("*.npz")):
        try:
            ep = np.load(f)
            r = np.asarray(ep["reward"], np.float64).reshape(-1)
        except Exception:
            continue
        if r.shape[0] < window:
            continue
        csum = np.concatenate([[0.0], np.cumsum(r)])
        scores = csum[window:] - csum[:-window]
        start = int(np.argmax(scores))
        if scores[start] > best[0]:
            best = (float(scores[start]), f, start)
    return best


def main():
    buffer_dir = Path(sys.argv[1])
    out = Path(sys.argv[2])
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    score, f, start = best_window(buffer_dir, window)
    if f is None:
        raise SystemExit(f"no episode of length >= {window} in {buffer_dir}")
    ep = np.load(f)
    obs = np.asarray(ep["observation"][start : start + window])  # [T,3,H,W] u8
    if obs.shape[1] in (1, 3):
        obs = obs.transpose(0, 2, 3, 1)
    from demo.t2v import save_video

    out.parent.mkdir(parents=True, exist_ok=True)
    save_video(obs.astype(np.float32) / 255.0, str(out))
    # also write the raw demo window (obs HWC + actions) so the posterior
    # target path (agent.imag_reward_args.target_from=posterior) can encode
    # the exact demonstration through the world model
    sl = slice(start, start + window)
    is_first = np.zeros(window, bool)
    is_first[0] = True  # fresh RSSM state at the window head (posterior
    # re-locks onto the images within a few steps even mid-episode)
    np.savez_compressed(
        out.with_suffix(".npz"),
        observation=obs,  # [T, H, W, C] u8
        action=np.asarray(ep["action"][sl], np.float32),
        is_first=is_first,
        reward=np.asarray(ep["reward"][sl], np.float32),
    )
    print(f"video prompt: {out} (+ .npz demo window) from "
          f"{f.name}[{start}:{start + window}] (window reward {score:.1f})")


if __name__ == "__main__":
    main()
