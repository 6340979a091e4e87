"""train.py eval loop + GenRL report panels (tiny scale, real walker env)."""

import os

import numpy as np
import pytest

os.environ.setdefault("MUJOCO_GL", "egl")

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
    "batch_size=2", "batch_length=16", "imag_horizon=6", "precision=32",
    "img_size=16", "+act_dim=6", "replay.minlen=16", "replay.maxlen=16",
    "+viclip_emb_dim=32", "+n_frames=4",
    "log_every_frames=2", "save_every_frames=1000", "snapshot_every_frames=1000",
    "task=walker_walk", "num_eval_episodes=2", "action_repeat=4",
]


class _FakeEnv:
    """Fixed-length episode emitting index-valued rewards."""

    def __init__(self, length, idx):
        self.length, self.idx, self.t = length, idx, 0

    def reset(self):
        self.t = 0
        return None, self._obs(is_first=True)

    def step(self, action):
        assert action.shape == (2,)
        self.t += 1
        return None, self._obs()

    def _obs(self, is_first=False):
        return {
            "observation": np.zeros((3, 8, 8), np.uint8),
            "reward": float(self.idx),
            "is_first": is_first,
            "is_last": self.t >= self.length,
            "is_terminal": False,
        }


def test_eval_pool_lockstep_masking():
    """Episodes of different lengths: finished envs stop accumulating and
    stop being stepped, while the batch shape stays static."""
    from genrl_tpu.utils.evaluation import EvalEnvPool

    pool = EvalEnvPool(lambda i: _FakeEnv(length=3 + 2 * i, idx=i + 1), 3)
    calls = []

    def policy(obs, carry, key):
        assert obs["observation"].shape == (3, 8, 8, 3)
        calls.append(1)
        return np.zeros((3, 2), np.float32), carry

    rewards, lengths = pool.rollout(policy, lambda n: None, lambda: None)
    assert list(lengths) == [3, 5, 7]
    assert list(rewards) == [3.0, 10.0, 21.0]
    assert len(calls) == 7  # longest episode bounds the lockstep loop


@pytest.fixture(scope="module")
def replay_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("replay6")
    rng = np.random.default_rng(0)
    T = 40
    emb = rng.normal(size=(T, 32)).astype(np.float32)
    ep = {
        "observation": rng.integers(0, 255, (T, 3, 16, 16), np.uint8),
        "action": rng.normal(size=(T, 6)).astype(np.float32),
        "reward": rng.normal(size=(T, 1)).astype(np.float32),
        "discount": np.ones((T, 1), np.float32),
        "is_first": np.zeros(T, bool),
        "is_last": np.zeros(T, bool),
        "is_terminal": np.zeros(T, bool),
        "clip_video": emb / np.linalg.norm(emb, axis=-1, keepdims=True),
    }
    ep["is_first"][0] = True
    ep["is_last"][-1] = True
    save_episode(ep, d, 0)
    return d


@pytest.mark.slow
def test_eval_and_report(tmp_path, replay_dir):
    emb = np.random.default_rng(1).normal(size=(32,)).astype(np.float32)
    p = tmp_path / "prompt.npy"
    np.save(p, emb / np.linalg.norm(emb))
    from genrl_tpu.configs import PRESETS, TRAIN_BASE
    from genrl_tpu.utils.config import compose

    cfg = compose(PRESETS, TRAIN_BASE, TINY + [
        f"replay_load_dir={replay_dir}", f"workdir={tmp_path}",
        "train_world_model=True", "train_connector=True",
        "agent.imag_reward_fn=video_text_reward", f"+prompt_embed_path={p}",
        "num_train_frames=2",
    ])
    ws = train_cli.Workspace(cfg)
    ws.train()
    # explicit eval with the imag policy on the real env
    r = ws.eval(use_imag=True)
    assert np.isfinite(r)
    eval_csv = (tmp_path / "walker_walk" / "eval.csv").read_text()
    assert "normalized_score" in eval_csv
    # report panels
    ws.report_visuals()
    videos = list((tmp_path / "walker_walk" / "videos").glob("*.npz"))
    names = {v.name.split("_")[0] for v in videos}
    assert any("openloop" in v.name for v in videos)
    assert any("video" in v.name for v in videos)  # video_clip_pred
