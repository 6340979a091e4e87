"""Device-resident replay: window gather semantics, is_first forcing,
bounds, jit-compatibility and the HBM budget gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genrl_tpu.data import save_episode
from genrl_tpu.data.device_replay import DeviceReplay, sample_windows


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("dr")
    rng = np.random.default_rng(0)
    for i, T in enumerate((20, 28, 36)):
        ep = {
            "observation": rng.integers(0, 255, (T, 3, 8, 8), np.uint8),
            "action": np.arange(T, dtype=np.float32)[:, None].repeat(2, 1) + 100 * i,
            "reward": rng.normal(size=(T, 1)).astype(np.float32),
            "is_first": np.zeros(T, bool),
            "is_last": np.zeros(T, bool),
            "is_terminal": np.zeros(T, bool),
        }
        ep["is_first"][0] = True
        ep["is_last"][-1] = True
        save_episode(ep, d, i)
    return DeviceReplay(d, length=8)


def test_shapes_and_layout(store):
    batch = store.sample(jax.random.PRNGKey(0), 5)
    assert batch["observation"].shape == (5, 8, 8, 8, 3)  # CHW -> HWC
    assert batch["action"].shape == (5, 8, 2)
    assert bool(np.asarray(batch["is_first"][:, 0]).all())  # crop head forced


def test_windows_are_contiguous_and_in_bounds(store):
    """Actions encode (episode*100 + t): windows must be consecutive t from
    one episode, never crossing padding."""
    for seed in range(5):
        batch = store.sample(jax.random.PRNGKey(seed), 16)
        a = np.asarray(batch["action"][..., 0])
        ep_id = np.round(a[:, 0] // 100).astype(int)
        t0 = a[:, 0] - 100 * ep_id
        for b in range(a.shape[0]):
            expect = 100 * ep_id[b] + t0[b] + np.arange(8)
            np.testing.assert_allclose(a[b], expect)
            # never beyond the episode's true length
            lengths = {0: 20, 1: 28, 2: 36}
            assert t0[b] + 8 <= lengths[ep_id[b]]


def test_sampling_inside_jit(store):
    @jax.jit
    def f(key):
        batch = sample_windows(store.arrays, store.ep_len, key, 4, 8)
        return batch["reward"].sum()

    v1 = float(f(jax.random.PRNGKey(1)))
    v2 = float(f(jax.random.PRNGKey(2)))
    assert np.isfinite(v1) and v1 != v2


def test_memory_gate(tmp_path):
    rng = np.random.default_rng(0)
    ep = {"observation": rng.integers(0, 255, (32, 3, 8, 8), np.uint8),
          "is_first": np.zeros(32, bool), "is_last": np.zeros(32, bool)}
    save_episode(ep, tmp_path, 0)
    with pytest.raises(MemoryError):
        DeviceReplay(tmp_path, length=8, max_bytes=10)


def test_device_ring_ingest_and_sample():
    """Online ring: FIFO overwrite, n_valid-restricted sampling, CHW->HWC."""
    from genrl_tpu.data.device_replay import DeviceRing

    ring = DeviceRing(capacity=3, maxlen=16, length=4)
    rng = np.random.default_rng(0)

    def make_ep(i, T):
        ep = {
            "observation": rng.integers(0, 255, (T, 3, 8, 8), np.uint8),
            "action": np.full((T, 2), float(i), np.float32),
            "is_first": np.zeros(T, bool),
            "is_last": np.zeros(T, bool),
        }
        ep["is_first"][0] = True
        ep["is_last"][-1] = True
        return ep

    ring.add_episode(make_ep(0, 2))  # shorter than length -> skipped
    assert len(ring) == 0
    for i in range(1, 5):  # 4 episodes into capacity 3 -> FIFO overwrite
        ring.add_episode(make_ep(i, 8 + i))
    assert len(ring) == 3 and ring.total_episodes == 4
    batch = sample_windows(ring.arrays, ring.ep_len,
                           jax.random.PRNGKey(0), 32, 4, None,
                           jnp.asarray(ring.count))
    assert batch["observation"].shape == (32, 4, 8, 8, 3)
    ids = np.unique(np.asarray(batch["action"][..., 0]))
    # episode 1 was overwritten by episode 4 (slot 0); only 2, 3, 4 remain
    assert set(ids.astype(int)) <= {2, 3, 4}
    assert bool(np.asarray(batch["is_first"][:, 0]).all())

    # jit-compatible with a traced n_valid
    f = jax.jit(lambda a, l, n, k: sample_windows(a, l, k, 8, 4, None, n))
    b2 = f(ring.arrays, ring.ep_len, ring.count, jax.random.PRNGKey(1))
    assert b2["action"].shape == (8, 4, 2)


@pytest.mark.slow
def test_train_step_on_scalar_reward_episode():
    """Regression: episodes collected from env wrappers carry SCALAR per-step
    rewards; _store_episode must normalize them to the reference (T, 1)
    schema so ring batches feed twohot heads correctly (the first real
    collector train step crashed on reward [B, T] before this)."""
    import jax
    import numpy as np

    from genrl_tpu.agents.assembly import make_agent
    from genrl_tpu.data import ReplayBuffer
    from genrl_tpu.data.device_replay import DeviceRing, sample_windows
    from genrl_tpu.configs import COLLECT_BASE, PRESETS
    from genrl_tpu.utils.config import compose

    tiny = [
        "rssm.hidden=32", "rssm.deter=32", "rssm.stoch=4", "rssm.discrete=4",
        "encoder.cnn_depth=8", "encoder.cnn_kernels=(4,4)",
        "decoder.cnn_depth=8", "decoder.cnn_kernels=(6,6)",
        "reward_head.layers=2", "reward_head.units=32", "reward_head.dist=twohot",
        "discount_head.layers=2", "discount_head.units=32",
        "actor.layers=2", "actor.units=32", "critic.layers=2", "critic.units=32",
        "batch_size=2", "batch_length=8", "imag_horizon=4", "precision=32",
        "img_size=16", "replay.minlen=8", "replay.maxlen=8", "agent=dreamer",
    ]
    cfg = compose(PRESETS, COLLECT_BASE, tiny)
    replay = ReplayBuffer(directory=None, length=8, capacity=100, minlen=8, seed=0)
    ring = DeviceRing(capacity=4, maxlen=32, length=8)
    replay.on_episode = ring.add_episode
    T = 24
    for t in range(T):
        replay.add({
            "observation": np.random.randint(0, 255, (3, 16, 16), np.uint8),
            "is_first": t == 0, "is_last": t == T - 1, "is_terminal": False,
            "reward": float(np.sin(t)),             # SCALAR reward
            "discount": 1.0,
            "action": np.zeros(4, np.float32),
        })
    ep = replay.episodes()[0]
    assert ep["reward"].shape == (T, 1)
    assert ep["discount"].shape == (T, 1)

    agent = make_agent(cfg, {"observation": (16, 16, 3)}, 4)
    state = agent.init(jax.random.PRNGKey(0))
    batch = sample_windows(ring.arrays, ring.ep_len, jax.random.PRNGKey(1),
                           2, 8, None, ring.count)
    assert batch["reward"].shape == (2, 8, 1)
    state, metrics = agent.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(np.asarray(metrics["model_loss"])))


def test_mixed_schema_skips_partial_episodes(tmp_path, capsys):
    """A partially-embedded dataset (some episodes missing clip_video) must
    load with the majority schema and LOUDLY skip the nonconforming episodes,
    not crash or silently drop the key (pipeline embed-stage crash hedge)."""
    rng = np.random.default_rng(1)
    T = 16
    for i in range(3):
        ep = {
            "observation": rng.integers(0, 255, (T, 3, 8, 8), np.uint8),
            "action": rng.normal(size=(T, 2)).astype(np.float32),
            "is_first": np.zeros(T, bool),
        }
        if i != 1:  # episode 1 was never embedded
            ep["clip_video"] = rng.normal(size=(T, 4)).astype(np.float32)
        save_episode(ep, tmp_path, i)
    store = DeviceReplay(tmp_path, length=8)
    assert "clip_video" in store.keys
    assert store.num_episodes == 2
    assert "skipping 1 episode(s)" in capsys.readouterr().out
    batch = store.sample(jax.random.PRNGKey(0), 4)
    assert batch["clip_video"].shape == (4, 8, 4)
