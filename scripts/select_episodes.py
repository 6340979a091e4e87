"""Select a stratified subset of buffer episodes into a dataset dir.

Usage:
    python scripts/select_episodes.py <buffer_dir> <out_dir> <n_total> [n_recent]

The InternVideo2 embedding pass costs ~16 windows/s on one chip, so embedding
an entire online-collection buffer (500+ episodes x 500 windows) is hours of
chip time the pipeline budget doesn't have. This picks `n_recent` most-recent
episodes (the collector improves over time, so recency ~ data quality) plus a
uniform stride over the remainder (coverage of early/diverse behavior the
world model still needs), and copies them — reference filename grammar intact
(tools/replay.py:262-298) — into `out_dir` for `process_dataset.py`.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path


def main():
    buffer_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    n_total = int(sys.argv[3])
    n_recent = int(sys.argv[4]) if len(sys.argv) > 4 else (2 * n_total) // 3

    # episode index is the first '-' field of the reference filename grammar
    eps = sorted(buffer_dir.glob("*.npz"),
                 key=lambda p: int(p.name.split("-", 1)[0]))
    n_recent = max(0, min(n_recent, n_total))
    if len(eps) <= n_total:
        chosen = eps
    else:
        recent = eps[len(eps) - n_recent:] if n_recent else []
        rest = eps[: len(eps) - n_recent]
        n_strided = max(0, n_total - len(recent))
        stride = max(1, len(rest) // max(1, n_strided))
        strided = rest[::stride][:n_strided] if n_strided else []
        chosen = strided + recent
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in chosen:
        dst = out_dir / p.name
        if not dst.exists():
            shutil.copy2(p, dst)
    print(f"selected {len(chosen)}/{len(eps)} episodes -> {out_dir}")


if __name__ == "__main__":
    main()
