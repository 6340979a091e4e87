"""Plan2Explore demonstration evidence (VERDICT r4 item 7).

Renders the intrinsic-exploration evidence from a Plan2Explore collection
run (reference recipe: `/root/reference/collect_data.yaml:12` +
`agent/plan2explore.py:44-108` — ensemble-disagreement intrinsic reward,
`expl_intr_scale=0.9, expl_extr_scale=0.0`):

  1. disagreement-ensemble training loss over frames (train.csv),
  2. the intrinsic (disagreement) reward the actor optimizes,
  3. episode diversity from the buffer itself: per-episode motion energy
     (mean |frame(t+1)-frame(t)|, exploration finds dynamic behaviors) and
     pairwise visual distance between episode-mean frames over collection
     order (coverage should not collapse to one mode).

Usage:
    python scripts/plot_p2e.py <run_dir> <out_dir>
e.g.
    python scripts/plot_p2e.py evidence/pipeline/collect_r5_s1/stickman_walk evidence/p2e
"""

from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

import numpy as np


def _read(path: Path):
    with path.open() as f:
        rows = list(csv.DictReader(f))
    cols: dict[str, list[float]] = {}
    for row in rows:
        for k, v in row.items():
            if not v:
                continue
            try:
                cols.setdefault(k, []).append(float(v))
            except ValueError:
                pass
    return {k: np.asarray(v) for k, v in cols.items()}


def episode_stats(buffer_dir: Path, max_eps: int = 200, stride: int = 4):
    """Per-episode motion energy + mean downsampled frame, in collection order."""
    files = sorted(buffer_dir.glob("*.npz"), key=lambda p: int(p.name.split("-")[0]))
    files = files[:max_eps]
    motion, means, returns, idx = [], [], [], []
    for f in files:
        with np.load(f) as d:
            obs = d["observation"][::stride].astype(np.float32)  # [T/s,3,64,64]
            motion.append(float(np.abs(np.diff(obs, axis=0)).mean()))
            # 8x8 thumbnail of the episode-mean frame for pairwise distances
            m = obs.mean(axis=0).mean(axis=0)  # [64,64]
            means.append(m.reshape(8, 8, 8, 8).mean(axis=(1, 3)).ravel())
            returns.append(float(d["reward"].sum()))
            idx.append(int(f.name.split("-")[0]))
    return np.asarray(idx), np.asarray(motion), np.asarray(means), np.asarray(returns)


def main():
    run_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    out_dir.mkdir(parents=True, exist_ok=True)
    cols = _read(run_dir / "train.csv")
    idx, motion, means, returns = episode_stats(run_dir / "buffer")

    # pairwise visual distance between episode-mean thumbnails
    diff = means[:, None, :] - means[None, :, :]
    pdist = np.sqrt((diff * diff).sum(-1))
    off = pdist[np.triu_indices(len(means), k=1)]

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(22, 4))
    ax = axes[0]
    ax.plot(cols["frame"], cols["disagreement_loss"], color="tab:blue")
    ax.set_xlabel("env frames")
    ax.set_ylabel("disagreement ensemble loss")
    ax.set_title("Ensemble one-step model training")
    ax = axes[1]
    ax.plot(cols["frame"], cols["reward_mean"], color="tab:orange", label="intrinsic reward mean")
    ax.set_xlabel("env frames")
    ax.set_title("Intrinsic (disagreement) reward")
    ax.legend()
    ax = axes[2]
    ax.scatter(idx, motion, s=12, color="tab:green")
    # running mean
    k = max(1, len(motion) // 10)
    rm = np.convolve(motion, np.ones(k) / k, mode="valid")
    ax.plot(idx[k - 1 :], rm, color="black", lw=2, label=f"running mean ({k} eps)")
    ax.set_xlabel("episode (collection order)")
    ax.set_ylabel("motion energy (mean |Δframe|)")
    ax.set_title("Exploration finds dynamic behavior")
    ax.legend()
    ax = axes[3]
    im = ax.imshow(pdist, cmap="viridis")
    ax.set_title("Pairwise episode visual distance")
    ax.set_xlabel("episode")
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.tight_layout()
    fig.savefig(out_dir / "p2e_evidence.png", dpi=120)

    half = len(motion) // 2
    nz = cols["disagreement_loss"] != 0  # skip the random seed phase (no training)
    dl, rw = cols["disagreement_loss"][nz], cols["reward_mean"][nz]
    summary = {
        "run_dir": str(run_dir),
        "frames": float(cols["frame"][-1]),
        "episodes": int(len(idx)),
        "train_start_frame": float(cols["frame"][nz][0]),
        "disagreement_loss_first_last": [float(dl[0]), float(dl[-1])],
        "intrinsic_reward_first_last": [float(rw[0]), float(rw[-1])],
        "motion_energy_first_half_mean": float(motion[:half].mean()),
        "motion_energy_second_half_mean": float(motion[half:].mean()),
        "pairwise_visual_distance_mean": float(off.mean()),
        "pairwise_visual_distance_p90_over_p10": float(
            np.percentile(off, 90) / max(np.percentile(off, 10), 1e-9)
        ),
        "env_return_max": float(returns.max()),
        "env_return_mean": float(returns.mean()),
    }
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
