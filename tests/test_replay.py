"""Replay buffer tests: reference-format episode loading, sampling, FIFO."""

import numpy as np
import pytest

from genrl_tpu.data import ReplayBuffer, count_episodes, load_episode, save_episode


def make_episode(T=20, act_dim=4, with_image=True):
    ep = {
        "is_first": np.zeros(T, bool),
        "is_last": np.zeros(T, bool),
        "is_terminal": np.zeros(T, bool),
        "action": np.random.randn(T, act_dim).astype(np.float32),
        "reward": np.random.randn(T, 1).astype(np.float32),
        "discount": np.ones((T, 1), np.float32),
    }
    if with_image:
        ep["observation"] = np.random.randint(0, 255, (T, 3, 16, 16), np.uint8)
    ep["is_first"][0] = True
    ep["is_last"][-1] = True
    return ep


def test_save_load_roundtrip(tmp_path):
    ep = make_episode()
    path = save_episode(ep, tmp_path, idx=1)
    assert path.name.endswith("-19.npz")  # episode_len = T-1
    loaded = load_episode(path)
    assert set(loaded) == set(ep)
    np.testing.assert_array_equal(loaded["action"], ep["action"])
    assert count_episodes(tmp_path) == (1, 19)


def test_sampling_shapes_and_hwc(tmp_path):
    for i in range(3):
        save_episode(make_episode(T=30), tmp_path, idx=i)
    buf = ReplayBuffer(directory=tmp_path, length=8, seed=0)
    assert len(buf) == 3
    batch = buf.sample_batch(batch_size=4, length=8)
    assert batch["observation"].shape == (4, 8, 16, 16, 3)  # CHW -> HWC
    assert batch["action"].shape == (4, 8, 4)
    assert batch["is_first"].dtype == bool
    # crop head is forced is_first
    assert batch["is_first"][:, 0].all()


def test_reference_episode_loads(fixture_episode_dir):
    buf = ReplayBuffer(directory=fixture_episode_dir, length=16, seed=0)
    assert len(buf) == 1
    assert buf.stats["loaded_steps"] == 500
    batch = buf.sample_batch(batch_size=2, length=16)
    assert batch["observation"].shape == (2, 16, 64, 64, 3)
    assert batch["clip_video"].shape == (2, 16, 512)
    assert batch["observation"].dtype == np.uint8


def test_online_add_and_fifo(tmp_path):
    buf = ReplayBuffer(directory=tmp_path, length=4, capacity=45, minlen=4, seed=0)
    for _ in range(4):
        ep = make_episode(T=20, with_image=False)
        for t in range(20):
            buf.add({k: v[t] for k, v in ep.items()})
    assert buf.stats["total_episodes"] == 4
    # capacity 45 transitions -> only 2 episodes of 19 stay loaded
    assert buf.stats["loaded_episodes"] == 2
    assert buf.stats["loaded_steps"] <= 45
    # but all were written to disk
    assert count_episodes(tmp_path)[0] == 4


def test_failure_signal_discards(tmp_path):
    from genrl_tpu.data.replay import SIG_FAILURE

    buf = ReplayBuffer(directory=None, length=4, seed=0)
    ep = make_episode(T=10, with_image=False)
    for t in range(5):
        buf.add({k: v[t] for k, v in ep.items()})
    buf.add({SIG_FAILURE: True})
    # ongoing episode was discarded; finishing steps start a fresh one
    for t in range(10):
        buf.add({k: v[t] for k, v in ep.items()})
    assert buf.stats["total_episodes"] == 1


def test_dataset_iterator(tmp_path):
    for i in range(2):
        save_episode(make_episode(T=30, with_image=False), tmp_path, idx=i)
    buf = ReplayBuffer(directory=tmp_path, length=8, seed=0)
    it = buf.dataset(batch_size=3, prefetch=2)
    b1 = next(it)
    b2 = next(it)
    assert b1["action"].shape == (3, 8, 4)
    assert not np.array_equal(b1["action"], b2["action"])
