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
