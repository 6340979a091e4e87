"""Dump dataset episodes as mp4s (reference: notebooks/visualize_dataset_episodes.ipynb).

    python scripts/visualize_dataset_episodes.py <dataset_dir> [out_dir] [n]
"""

import sys
from pathlib import Path

import numpy as np


def main():
    dataset_dir = Path(sys.argv[1])
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "episode_videos")
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    out_dir.mkdir(parents=True, exist_ok=True)
    from demo.t2v import save_video
    from genrl_tpu.data.replay import load_episode

    for path in sorted(dataset_dir.glob("**/*.npz"))[:n]:
        ep = load_episode(path)
        obs = ep["observation"]  # [T, C, H, W] uint8
        video = np.transpose(obs, (0, 2, 3, 1)).astype(np.float32) / 255.0
        out = out_dir / f"{path.stem}.mp4"
        save_video(video, out)
        print(f"{path.name}: T={obs.shape[0]} reward={ep['reward'].sum():.1f} -> {out}")


if __name__ == "__main__":
    main()
