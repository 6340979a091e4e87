"""The armed TPU pipeline in miniature (scripts/auto_resume_r3b.sh stages
2 -> 3 -> 5): WM+connector pretrain with embedding whitening -> video-prompt
behavior (video_video_reward, task_video=<file>, align_initial) resumed from
that snapshot with the whitening stats chained through embed_stats.npz ->
finetune from the behavior snapshot.

The runner executes this exact flag set unattended on the real TPU whenever
the relay returns; every stage here uses the runner's own overrides (scaled
down) so the chain cannot rot between TPU windows. Reference flow:
/root/reference/README.md:127-156 (pretrain -> language behavior -> finetune).
"""

import numpy as np
import pytest

import train as train_cli
from genrl_tpu.data import save_episode

# random-weight ViCLIP joint-space width (clip_wrapper.ViCLIP embed_dim
# default; with no checkpoint on disk nothing overrides it)
EMB = 512

# tiny-but-structurally-complete IV2 tower, as in test_checkpoint_landing
VIT_TINY = dict(img_size=32, patch_size=8, embed_dim=64, depth=2,
                num_heads=4, mlp_ratio=48 / 11, num_frames=8,
                clip_embed_dim=48, sep_image_video_pos_embed=True)
BERT_TINY = dict(vocab_size=64, hidden=32, layers=2, heads=2, intermediate=64)

TINY = [
    "rssm.hidden=32", "rssm.deter=32", "rssm.stoch=4", "rssm.discrete=4",
    "encoder.cnn_depth=8", "encoder.cnn_kernels=(4,4)",
    "decoder.cnn_depth=8", "decoder.cnn_kernels=(6,6)",
    "reward_head.layers=2", "reward_head.units=32",
    "discount_head.layers=2", "discount_head.units=32",
    "actor.layers=2", "actor.units=32", "critic.layers=2", "critic.units=32",
    "agent.connector_rssm.hidden=32", "agent.connector_rssm.deter=32",
    "agent.connector_rssm.stoch=4", "agent.connector_rssm.discrete=4",
    "batch_size=4", "batch_length=8", "imag_horizon=8", "precision=32",
    "img_size=16", "+act_dim=10", "replay.minlen=8", "replay.maxlen=8",
    f"+viclip_emb_dim={EMB}", "+n_frames=4",
    "log_every_frames=2", "save_every_frames=2", "snapshot_every_frames=1000",
]


@pytest.fixture(scope="module")
def replay_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("replay_chain")
    rng = np.random.default_rng(0)
    for i in range(2):
        T = 32
        emb = rng.normal(size=(T, EMB)).astype(np.float32)
        ep = {
            "observation": rng.integers(0, 255, (T, 3, 16, 16), np.uint8),
            "action": rng.normal(size=(T, 10)).astype(np.float32),  # real stickman act dim: eval steps the real env
            "reward": rng.normal(size=(T, 1)).astype(np.float32),
            "discount": np.ones((T, 1), np.float32),
            "is_first": np.zeros(T, bool),
            "is_last": np.zeros(T, bool),
            "is_terminal": np.zeros(T, bool),
            "clip_video": emb / np.linalg.norm(emb, axis=-1, keepdims=True),
        }
        ep["is_first"][0] = True
        ep["is_last"][-1] = True
        save_episode(ep, d, i)
    return d


def _write_prompt_video(path):
    """16 frames of structured noise through cv2 — the same decode path
    (get_vid_features_from_file) the runner's prompt_r3b.mp4 takes."""
    cv2 = pytest.importorskip("cv2")
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 8, (32, 32))
    assert w.isOpened(), "cv2 VideoWriter could not open (no MJPG codec?)"
    rng = np.random.default_rng(3)
    for t in range(16):
        frame = rng.integers(0, 255, (32, 32, 3), np.uint8)
        frame[:, : 2 * t % 32] //= 2  # a moving edge so frames differ
        w.write(frame)
    w.release()


def run(args, workdir, replay_dir, n, extra=()):
    argv = TINY + [
        f"replay_load_dir={replay_dir}", f"workdir={workdir}",
        f"num_train_frames={n}", *args, *extra,
    ]
    train_cli.main(argv)


@pytest.mark.slow
def test_runner_chain_wm_behavior_finetune(tmp_path, replay_dir, monkeypatch):
    from genrl_tpu.models import clip_wrapper, internvideo2

    # stage 3 constructs the real ViCLIP for the task_video embed; shrink the
    # towers and isolate the singleton cache exactly like the landing test
    monkeypatch.setattr(clip_wrapper, "VIT_1B", VIT_TINY)
    monkeypatch.setattr(clip_wrapper, "BERT_LARGE", BERT_TINY)
    monkeypatch.setattr(internvideo2, "_GLOBAL", {})
    models_root = tmp_path / "models"  # empty -> random weights, joint dim 512

    # ---- stage 2: WM + connector pretrain with whitening (runner WM48) -----
    wm = tmp_path / "wm48"
    run(["train_world_model=True", "train_connector=True",
         "embed_whiten=True", "viclip_encode=False", "steps_per_dispatch=2"],
        wm, replay_dir, n=4)
    snaps = wm / "stickman_walk" / "snapshots"
    assert (snaps / "last_snapshot").exists()
    stats = snaps / "embed_stats.npz"
    assert stats.exists()
    wm_mean = np.load(stats)["mean"]

    # ---- stage 3: behavior from a video prompt (runner beh_r3 flags) -------
    prompt = tmp_path / "prompt.avi"
    _write_prompt_video(prompt)
    beh = tmp_path / "beh_r3"
    run(["agent.imag_reward_fn=video_video_reward", f"task_video={prompt}",
         "embed_whiten=True", "agent.imag_reward_args.align_initial=True",
         "agent.imag_reward_args.align_sequence=False",
         "eval_modality=task_imag", "eval_every_frames=4",
         "num_eval_episodes=1", f"snapshot_load_dir={snaps}",
         "viclip_encode=False", "steps_per_dispatch=2",
         f"models_root={models_root}"],
        beh, replay_dir, n=4)
    beh_dir = beh / "stickman_walk"
    content = (beh_dir / "train.csv").read_text()
    assert "imag_actor_loss" in content.splitlines()[0]

    # whitening stats must CHAIN from the pretrain run, not be recomputed
    beh_stats = beh_dir / "snapshots" / "embed_stats.npz"
    assert beh_stats.exists()
    np.testing.assert_array_equal(np.load(beh_stats)["mean"], wm_mean)

    # env eval of the imag policy ran and logged monotone steps (the r2
    # duplicate-rows wart: eval.csv must never repeat a step)
    eval_csv = beh_dir / "eval.csv"
    assert eval_csv.exists()
    lines = eval_csv.read_text().splitlines()
    assert "normalized_score" in lines[0]
    step_col = lines[0].split(",").index("step")
    steps = [float(l.split(",")[step_col]) for l in lines[1:]]
    assert len(steps) >= 1
    assert steps == sorted(set(steps)), f"eval.csv steps not monotone: {steps}"

    # ---- stage 5: finetune from the behavior snapshot (runner finetune_r3) --
    ft = tmp_path / "ft"
    run(["finetune=True", f"snapshot_load_dir={beh_dir / 'snapshots'}",
         "embed_whiten=True", "viclip_encode=False", "steps_per_dispatch=2"],
        ft, replay_dir, n=3)
    header = (ft / "stickman_walk" / "train.csv").read_text().splitlines()[0]
    assert "imag_actor_loss" in header
    assert "reward_loss" in header
    assert "connector_loss" not in header
