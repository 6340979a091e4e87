"""collect_data.py and process_dataset.py CLI smoke tests (tiny scale, CPU)."""

import os
import shutil

import numpy as np
import pytest

os.environ.setdefault("MUJOCO_GL", "egl")

TINY = [
    "rssm.hidden=32", "rssm.deter=32", "rssm.stoch=4", "rssm.discrete=4",
    "encoder.cnn_depth=8", "encoder.cnn_kernels=(4,4)",
    "decoder.cnn_depth=8", "decoder.cnn_kernels=(6,6)",
    "reward_head.layers=2", "reward_head.units=32",
    "discount_head.layers=2", "discount_head.units=32",
    "actor.layers=2", "actor.units=32", "critic.layers=2", "critic.units=32",
    "agent.disag_units=32", "agent.disag_layers=2",
    "batch_size=4", "batch_length=8", "imag_horizon=6", "precision=32",
    "img_size=16", "replay.minlen=8", "replay.maxlen=8",
    "log_every_frames=50", "save_every_frames=1000000",
    "num_seed_frames=40", "train_every_actions=20",
]


@pytest.mark.slow
def test_collect_data_plan2explore(tmp_path):
    import collect_data as cli

    cli.main(TINY + [
        "task=walker_walk", "num_train_frames=120", "action_repeat=2",
        f"workdir={tmp_path}",
    ])
    buffers = list((tmp_path / "walker_walk" / "buffer").glob("*.npz"))
    # no full episode completes in 60 env steps (walker ep = 500), but the
    # CSV + snapshot must exist
    assert (tmp_path / "walker_walk" / "train.csv").exists()
    assert (tmp_path / "walker_walk" / "snapshots" / "last_snapshot").exists()


def test_collect_data_resumes_from_snapshot(tmp_path):
    """Kill-and-resume: a relaunched collector reloads the snapshot counters
    (reference: collect_data.py:316-319) and re-ingests buffer/ NPZs."""
    import collect_data as cli

    args = TINY + ["task=walker_walk", "num_train_frames=120",
                   "action_repeat=2", f"workdir={tmp_path}"]
    cli.main(args)  # run 1: 60 steps, writes last_snapshot

    from genrl_tpu.configs import COLLECT_BASE, PRESETS
    from genrl_tpu.utils.config import compose

    cfg = compose(PRESETS, COLLECT_BASE, args)
    ws = cli.Workspace(cfg)  # run 2 workspace: must resume, not start fresh
    assert ws.global_step == 60


@pytest.mark.slow
def test_collect_data_batched_envs(tmp_path):
    """num_collect_envs>1: N lockstep envs share one batched policy call per
    timestep; per-env episode accounting stays separate (replay env_id) and
    the grad-step : frame ratio is preserved."""
    import collect_data as cli

    cli.main(TINY + [
        "task=walker_walk", "num_train_frames=240", "action_repeat=2",
        "num_collect_envs=3", f"workdir={tmp_path}",
    ])
    ws_dir = tmp_path / "walker_walk"
    assert (ws_dir / "train.csv").exists()
    assert (ws_dir / "snapshots" / "last_snapshot").exists()

    from genrl_tpu.configs import COLLECT_BASE, PRESETS
    from genrl_tpu.utils.config import compose

    cfg = compose(PRESETS, COLLECT_BASE, TINY + [
        "task=walker_walk", "num_train_frames=240", "action_repeat=2",
        "num_collect_envs=3", f"workdir={tmp_path}"])
    ws = cli.Workspace(cfg)
    assert ws.global_step >= 120  # resumed past the 120-step budget


def test_accumulate_flush_alignment():
    """The deferred ViCLIP flush must match reference alignment
    (collect_data.py:244-246): embeds[-1] on the final transition,
    embeds[:-1] backfilling the tail, zero pad at the head."""
    from genrl_tpu.data import ReplayBuffer

    replay = ReplayBuffer(length=4, minlen=1)
    T, n, d = 10, 4, 8
    rng = np.random.default_rng(0)
    embeds = [rng.normal(size=d).astype(np.float32) for _ in range(n)]
    for t in range(T):
        replay.add({"observation": np.zeros(3, np.float32),
                    "clip_video": np.zeros(d, np.float32),
                    "is_first": t == 0, "is_last": False})
    # episode end, mirroring collect_data.Workspace.train's flush
    replay.attach_key("clip_video", embeds[:-1])
    replay.add({"observation": np.zeros(3, np.float32),
                "clip_video": embeds[-1], "is_first": False, "is_last": True})
    ep = next(iter(replay._episodes.values()))
    assert ep["clip_video"].shape == (T + 1, d)
    # zeros at 0..T-n, embeds at T-n+1..T (window ENDING at each frame)
    assert np.allclose(ep["clip_video"][: T + 1 - n], 0)
    for i, e in enumerate(embeds):
        np.testing.assert_allclose(ep["clip_video"][T + 1 - n + i], e)


def test_process_dataset_roundtrip(tmp_path, fixture_episode_dir):
    import process_dataset as cli

    from genrl_tpu.models import internvideo2 as iv2
    from genrl_tpu.models.clip_wrapper import ViCLIP

    # tiny random-weight clip so the pass is fast; monkeypatch the singleton
    tiny = ViCLIP(models_root=str(tmp_path), use_flash=False, n_frames=2,
                  dtype=np.float32,
                  vision_cfg=dict(img_size=28, patch_size=14, embed_dim=32,
                                  depth=1, num_heads=4, mlp_ratio=2.0,
                                  num_frames=2, clip_embed_dim=16,
                                  attn_pool_num_heads=4,
                                  sep_image_video_pos_embed=True),
                  text_cfg=dict(vocab_size=100, hidden=32, layers=1, heads=4,
                                intermediate=64))
    iv2._GLOBAL["internvideo2:models"] = tiny

    data_dir = tmp_path / "ds"
    data_dir.mkdir()
    src = sorted(os.listdir(fixture_episode_dir))[0]
    # shrink the fixture episode to 12 steps for speed, drop clip keys
    from genrl_tpu.data.replay import load_episode

    ep = load_episode(os.path.join(fixture_episode_dir, src))
    ep = {k: v[:12] for k, v in ep.items() if k not in ("clip_video", "clip_img")}
    np.savez_compressed(data_dir / src, **ep)

    cli.main([f"dataset_dir={data_dir}", "batch_windows=4"])
    out = load_episode(data_dir / src)
    assert out["clip_video"].shape == (12, 512)
    # zero head-pad for the first n_frames-1 steps
    assert np.allclose(out["clip_video"][0], 0)
    assert np.linalg.norm(out["clip_video"][-1]) > 0.9
    # skip_existing: second run skips
    done, skipped = cli.Workspace(
        __import__("genrl_tpu.utils.config", fromlist=["compose"]).compose(
            __import__("genrl_tpu.configs", fromlist=["PRESETS"]).PRESETS,
            __import__("genrl_tpu.configs", fromlist=["PROCESS_BASE"]).PROCESS_BASE,
            [f"dataset_dir={data_dir}"])).process()
    assert done == 0 and skipped == 1
