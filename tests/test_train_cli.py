"""train.py CLI smoke tests: WM+connector phase, snapshot resume, behavior
phase from a prompt-embed file — all at tiny scale on the CPU mesh."""

import numpy as np
import pytest

import train as train_cli
from genrl_tpu.data import save_episode

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
    "img_size=16", "+act_dim=4", "replay.minlen=8", "replay.maxlen=8",
    "+viclip_emb_dim=32", "+n_frames=4",
    "log_every_frames=2", "save_every_frames=2", "snapshot_every_frames=1000",
]


@pytest.fixture(scope="module")
def replay_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("replay")
    rng = np.random.default_rng(0)
    for i in range(2):
        T = 32
        emb = rng.normal(size=(T, 32)).astype(np.float32)
        ep = {
            "observation": rng.integers(0, 255, (T, 3, 16, 16), np.uint8),
            "action": rng.normal(size=(T, 4)).astype(np.float32),
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


def run(args, workdir, replay_dir, n=3, extra=()):
    argv = TINY + [
        f"replay_load_dir={replay_dir}", f"workdir={workdir}",
        f"num_train_frames={n}", *args, *extra,
    ]
    train_cli.main(argv)


@pytest.mark.slow
def test_wm_connector_phase_and_resume(tmp_path, replay_dir):
    wd = tmp_path / "ws"
    run(["train_world_model=True", "train_connector=True"], wd, replay_dir, n=3)
    snap_root = wd / "stickman_walk" / "snapshots"
    assert (snap_root / "last_snapshot").exists()
    # resume: second run continues from step 3
    run(["train_world_model=True", "train_connector=True"], wd, replay_dir, n=5)
    train_csv = wd / "stickman_walk" / "train.csv"
    content = train_csv.read_text()
    assert "model_loss" in content


@pytest.mark.slow
def test_behavior_phase_from_prompt_embed(tmp_path, replay_dir):
    wd = tmp_path / "ws2"
    emb = np.random.default_rng(1).normal(size=(32,)).astype(np.float32)
    p = tmp_path / "prompt.npy"
    np.save(p, emb / np.linalg.norm(emb))
    run(
        ["train_world_model=True", "train_connector=True",
         "agent.imag_reward_fn=video_text_reward", f"+prompt_embed_path={p}"],
        wd, replay_dir, n=2,
    )
    content = (wd / "stickman_walk" / "train.csv").read_text()
    assert "imag_actor_loss" in content


@pytest.mark.slow
def test_behavior_phase_posterior_target(tmp_path, replay_dir):
    """target_from=posterior: the demo-window npz (make_video_prompt grammar)
    drives the behavior target through the WM posterior instead of the
    connector (GenRLAgent.make_posterior_target)."""
    wd = tmp_path / "wsp"
    rng = np.random.default_rng(2)
    T = 24
    np.savez_compressed(
        tmp_path / "demo.npz",
        observation=rng.integers(0, 255, (T, 16, 16, 3), np.uint8),
        action=rng.normal(size=(T, 4)).astype(np.float32),
        is_first=np.eye(1, T, dtype=bool)[0],
        reward=rng.normal(size=(T, 1)).astype(np.float32),
    )
    run(
        ["agent.imag_reward_fn=video_video_reward",
         "agent.imag_reward_args.target_from=posterior",
         "agent.imag_reward_args.align_initial=True",
         "agent.imag_reward_args.align_sequence=False",
         "agent.imag_reward_args.score_clip=0.5",
         f"demo_npz={tmp_path / 'demo.npz'}"],
        wd, replay_dir, n=2,
    )
    content = (wd / "stickman_walk" / "train.csv").read_text()
    assert "imag_actor_loss" in content


@pytest.mark.slow
def test_embed_whiten_phase(tmp_path, replay_dir):
    """embed_whiten=True: dataset clip_video and the prompt embed get one
    consistent mean-center+renorm (rewards/embed_stats.py), stats land next
    to the snapshots, and a follow-up run can reuse them."""
    wd = tmp_path / "wsw"
    emb = np.random.default_rng(1).normal(size=(32,)).astype(np.float32)
    p = tmp_path / "prompt.npy"
    np.save(p, emb / np.linalg.norm(emb))
    run(["train_world_model=True", "train_connector=True",
         "agent.imag_reward_fn=video_text_reward", "embed_whiten=True",
         f"+prompt_embed_path={p}"], wd, replay_dir, n=2)
    stats_path = wd / "stickman_walk" / "snapshots" / "embed_stats.npz"
    assert stats_path.exists()
    content = (wd / "stickman_walk" / "train.csv").read_text()
    assert "imag_actor_loss" in content

    # unit math: whitening spreads a collapsed space, keeps padding at zero
    from genrl_tpu.rewards.embed_stats import compute_embed_mean, whiten

    rng = np.random.default_rng(0)
    base = rng.normal(size=(32,))
    seqs = base + 0.01 * rng.normal(size=(10, 6, 32))
    seqs /= np.linalg.norm(seqs, axis=-1, keepdims=True)
    seqs[0, :2] = 0.0  # padded rows excluded from the statistic
    mean = compute_embed_mean(list(seqs.astype(np.float32)))
    w = whiten(seqs.astype(np.float32), mean)
    assert np.all(w[0, :2] == 0.0)
    flat = w.reshape(-1, 32)
    flat = flat[np.linalg.norm(flat, axis=-1) > 0]
    np.testing.assert_allclose(np.linalg.norm(flat, axis=-1), 1.0, atol=1e-5)
    raw = seqs.reshape(-1, 32)[2:]
    raw_cos = raw @ raw.T
    white_cos = flat @ flat.T
    off = ~np.eye(len(flat), dtype=bool)
    assert white_cos[off].mean() < raw_cos[off].mean() - 0.3


def test_data_free_phase(tmp_path, replay_dir):
    wd = tmp_path / "ws3"
    emb = np.random.default_rng(1).normal(size=(32,)).astype(np.float32)
    p = tmp_path / "prompt.npy"
    np.save(p, emb / np.linalg.norm(emb))
    run(
        ["train_from_data=False", "agent.imag_reward_fn=video_text_reward",
         f"+prompt_embed_path={p}"],
        wd, replay_dir, n=2,
    )
    content = (wd / "stickman_walk" / "train.csv").read_text()
    assert "imag_actor_loss" in content


@pytest.mark.slow
def test_finetune_phase(tmp_path, replay_dir):
    """finetune=True (reference: GenRLAgent.finetune_mode, agent/genrl.py:
    55-59): WM pretrain -> finetune run loads the snapshot, trains the reward
    head (grad_heads + reward) and updates the imag behavior with env reward,
    with connector updates stopped."""
    wd = tmp_path / "pre"
    run(["train_world_model=True", "train_connector=True"], wd, replay_dir, n=3)
    wd2 = tmp_path / "ft"
    run(["finetune=True",
         f"snapshot_load_dir={wd / 'stickman_walk' / 'snapshots'}"],
        wd2, replay_dir, n=3)
    content = (wd2 / "stickman_walk" / "train.csv").read_text()
    header = content.splitlines()[0]
    assert "imag_actor_loss" in header          # imag behavior trained
    assert "connector_loss" not in header       # connector frozen
    assert "reward_loss" in header              # reward head in grad_heads

    # the agent-side switch: reward head joins grad_heads
    from genrl_tpu.agents.assembly import make_agent
    from genrl_tpu.configs import PRESETS, TRAIN_BASE
    from genrl_tpu.utils.config import compose

    cfg = compose(PRESETS, TRAIN_BASE, TINY + ["finetune=True"])
    agent = make_agent(cfg, {"observation": (16, 16, 3)}, 4)
    assert "reward" not in agent.wm.grad_heads
    agent.finetune_mode()
    assert "reward" in agent.wm.grad_heads


def test_reward_registry_dispatch():
    """REWARD_REGISTRY is the real dispatch: unknown names fail loudly, and
    each spec routes its modality's embedding path."""
    from genrl_tpu.rewards import REWARD_REGISTRY, resolve_reward

    with pytest.raises(KeyError, match="unknown reward fn"):
        resolve_reward("video_txt_reward")  # typo
    assert resolve_reward("video_text_reward").needs_target
    assert not resolve_reward("env_reward").needs_target

    class FakeClip:
        def get_txt_feat(self, prompt):
            assert prompt == "robot walk fast clean"
            return np.ones((1, 8), np.float32)

        def get_vid_features_from_file(self, path):
            raise AssertionError("text spec must not touch video path")

    from genrl_tpu.utils.config import Config

    cfg = Config.from_dict({})
    emb = REWARD_REGISTRY["video_text_reward"].prompt_embed(
        FakeClip(), cfg, "stickman_walk")
    assert emb.shape == (8,)
    assert REWARD_REGISTRY["env_reward"].prompt_embed(None, cfg, "x") is None


@pytest.mark.slow
def test_snapshot_search_dir(tmp_path, replay_dir):
    """Config-matching workdir search (the reference's wandb run search,
    train.py:72-133, re-homed onto config.json files)."""
    root = tmp_path / "experiments"
    wd_a = root / "runA"
    run(["train_world_model=True", "seed=3"], wd_a, replay_dir, n=3)
    wd_b = root / "runB"  # different seed — must NOT match
    run(["train_world_model=True", "seed=4"], wd_b, replay_dir, n=3)

    from genrl_tpu.utils.checkpoint import search_snapshot

    found = search_snapshot(root, {"task": "stickman_walk", "seed": 3})
    assert found is not None and str(wd_a) in str(found)
    assert search_snapshot(root, {"task": "stickman_walk", "seed": 99}) is None

    # end-to-end: a fresh workspace finds + loads the seed-3 snapshot
    wd_c = tmp_path / "consumer"
    run(["train_world_model=True", "seed=3", f"snapshot_search_dir={root}",
         "agent_name_snapshot=genrl"], wd_c, replay_dir, n=2)
    assert (wd_c / "stickman_walk" / "train.csv").exists()


@pytest.mark.slow
def test_zero1_phase_and_resume(tmp_path, replay_dir):
    """mesh.zero1 end-to-end: the WM+connector phase with ZeRO-1 sharded
    optimizer state (parallel/mesh.py:state_shardings), including the
    snapshot write (sharded moments pulled to host) and resume re-placement."""
    wd = tmp_path / "ws"
    run(["train_world_model=True", "train_connector=True", "mesh.zero1=True"],
        wd, replay_dir, n=3)
    snap_root = wd / "stickman_walk" / "snapshots"
    assert (snap_root / "last_snapshot").exists()
    run(["train_world_model=True", "train_connector=True", "mesh.zero1=True"],
        wd, replay_dir, n=5)
    assert "model_loss" in (wd / "stickman_walk" / "train.csv").read_text()
