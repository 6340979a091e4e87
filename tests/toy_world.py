"""A CPU-scale analog of the GenRL locomotion benchmark: the treadmill world.

1-D point mass with UNBOUNDED position x, rendered egocentrically: the image
shows only the gait phase (x mod 1) as an interpolated bar column, the way a
tracking camera shows a walker's posture but not its absolute position. Env
reward is rightward progress (x' - x), never shown to the behavior learner.
Moving right produces a repeating visual cycle from ANY start — so a
demonstration window is matchable from every initial state (like a gait), and
moving left produces the SAME frame set in reverse order, which pose-matching
scores cannot distinguish but motion (delta) scores can. That makes this
world a discriminating testbed for the alignment-reward configs
(rewards/plugins.py): the r4b failure mode (pose matching scores standing
still / wrong direction) is expressible here at 16x16 scale.

Used by tests/test_env_return_transfer.py — the env-return assertion VERDICT
r4 item 3 asked for — and runnable diagnostics (its __main__).
"""

from __future__ import annotations

import numpy as np

IMG = 16
ACT = 1
EP_LEN = 24
SPEED = 0.15  # x += SPEED * clip(a, -1, 1)


def render(x: float) -> np.ndarray:
    """Gait phase (x mod 1) -> [IMG, IMG, 3] uint8, sub-pixel interpolated
    bar with a wrap-around column so the cycle is visually smooth."""
    img = np.zeros((IMG, IMG, 3), np.uint8)
    phase = float(x) % 1.0
    col = phase * IMG
    j, frac = int(col) % IMG, col - int(col)
    img[:, j] = int(255 * (1 - frac))
    img[:, (j + 1) % IMG] = int(255 * frac)
    return img


def step_dynamics(x: float, a: float) -> float:
    return float(x + SPEED * float(np.clip(a, -1, 1)))


def gen_episode(rng, drift: float, start=None, noise: float = 0.6,
                ep_len: int = EP_LEN):
    """One episode under a drifted random policy a ~ drift + noise.
    Returns (obs [T,H,W,C] u8, action [T,A] f32, is_first [T] bool,
    reward [T] f32 = rightward progress)."""
    x = float(rng.uniform(0, 1)) if start is None else start
    obs, acts, firsts, rews = [render(x)], [np.zeros(ACT, np.float32)], [True], [0.0]
    for _ in range(ep_len - 1):
        a = float(np.clip(drift + noise * rng.normal(), -1, 1))
        nx = step_dynamics(x, a)
        rews.append(nx - x)
        x = nx
        obs.append(render(x))
        acts.append(np.asarray([a], np.float32))
        firsts.append(False)
    return (np.stack(obs), np.stack(acts), np.asarray(firsts, bool),
            np.asarray(rews, np.float32))


def make_dataset(rng, n_eps: int = 64):
    """Mixed-competence offline dataset: per-episode drift in [-0.8, 0.8]
    (mirrors a collected buffer spanning junk to near-demo behavior)."""
    eps = [gen_episode(rng, drift=float(rng.uniform(-0.8, 0.8)))
           for _ in range(n_eps)]
    return (np.stack([e[0] for e in eps]), np.stack([e[1] for e in eps]),
            np.stack([e[2] for e in eps]), np.stack([e[3] for e in eps]))


def sample_batch(rng, data, batch: int, length: int):
    obs, act, first, rew = data
    n, t = obs.shape[:2]
    ei = rng.integers(0, n, batch)
    ti = rng.integers(0, t - length + 1, batch)
    sl = lambda arr: np.stack([arr[e, s:s + length] for e, s in zip(ei, ti)])
    d = {
        "observation": sl(obs), "action": sl(act), "is_first": sl(first),
        "is_terminal": np.zeros((batch, length), bool),
        "reward": sl(rew)[..., None].astype(np.float32),
        "discount": np.ones((batch, length, 1), np.float32),
    }
    d["is_first"][:, 0] = True  # window starts re-anchor the filter
    return d


def env_rollout(agent, state, actor_params, key, n_envs: int = 16,
                seed: int = 0, ep_len: int = EP_LEN):
    """Roll an imag-actor in the REAL treadmill; mean rightward progress."""
    import jax
    import numpy as np

    pol = jax.jit(lambda s, o, c, k, p: agent.policy_step(
        s.replace(imag=s.imag.replace(actor_params=p)), o, c, k,
        eval_mode=True, use_imag=True))
    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, 1, n_envs)
    carry = agent.init_policy_carry(n_envs)
    totals = np.zeros(n_envs)
    actions = []
    obs_d = {
        "observation": np.stack([render(x) for x in xs]),
        "is_first": np.ones(n_envs, bool),
        "is_terminal": np.zeros(n_envs, bool),
        "reward": np.zeros((n_envs, 1), np.float32),
    }
    for _ in range(ep_len - 1):
        key, k = jax.random.split(key)
        action, carry = pol(state, obs_d, carry, k, actor_params)
        action = np.asarray(action).reshape(n_envs, ACT)
        actions.append(action)
        for i in range(n_envs):
            nx = step_dynamics(xs[i], action[i, 0])
            totals[i] += nx - xs[i]
            xs[i] = nx
        obs_d = dict(obs_d, observation=np.stack([render(x) for x in xs]),
                     is_first=np.zeros(n_envs, bool))
    return float(totals.mean()), float(np.mean(actions))
