"""Decode an imagined video from a prompt embedding with a trained snapshot.

Usage:
    python scripts/make_t2v_evidence.py <snapshot_dir> <prompt_embed.npy> \
        [out_dir] [duration]

Drives the demo backend (demo/t2v.py, reference demo/t2v.py:51-88) end to
end: prompt embedding -> connector video_imagine -> world-model decoder, and
writes the decoded frames as an .mp4 plus a frame-strip .png into out_dir.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    snapshot_dir = sys.argv[1]
    embed_path = sys.argv[2]
    out_dir = Path(sys.argv[3] if len(sys.argv) > 3 else "evidence/t2v")
    duration = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    out_dir.mkdir(parents=True, exist_ok=True)

    from demo.t2v import Text2Video, save_video

    class _NoClip:  # the snapshot path needs no text encoder
        pass

    t2v = Text2Video.__new__(Text2Video)
    import jax

    from genrl_tpu.agents.assembly import GenRLAgent
    from genrl_tpu.configs import PRESETS, TRAIN_BASE
    from genrl_tpu.utils.checkpoint import SnapshotManager
    from genrl_tpu.utils.config import compose

    t2v.cfg = compose(PRESETS, TRAIN_BASE, ["task=stickman_walk"])
    t2v.agent = GenRLAgent(t2v.cfg, {"observation": (64, 64, 3)}, act_dim=10)
    template = t2v.agent.init(jax.random.PRNGKey(0))
    loaded = SnapshotManager(Path(snapshot_dir)).load(template)
    assert loaded is not None, f"no snapshot in {snapshot_dir}"
    t2v.state, _ = loaded
    t2v._key = jax.random.PRNGKey(42)

    embed = np.load(embed_path).reshape(-1).astype(np.float32)
    embed /= max(np.linalg.norm(embed), 1e-8)
    video = np.asarray(t2v.imagine_from_embed(embed, duration=duration))[0]
    print(f"decoded video: {video.shape} in [{video.min():.3f}, {video.max():.3f}]")

    save_video(video, str(out_dir / "t2v_stickman_walk.mp4"))
    strip = (np.concatenate(list(video[:: max(1, len(video) // 8)][:8]), axis=1)
             * 255).astype(np.uint8)
    import cv2

    cv2.imwrite(str(out_dir / "t2v_strip.png"),
                cv2.cvtColor(strip, cv2.COLOR_RGB2BGR))
    np.savez_compressed(out_dir / "t2v_frames.npz", video=video)
    print(f"wrote {out_dir}/t2v_stickman_walk.mp4, t2v_strip.png, t2v_frames.npz")


if __name__ == "__main__":
    main()
