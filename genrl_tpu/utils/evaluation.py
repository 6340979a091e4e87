"""Batched env-rollout evaluation.

The reference evaluates episodes sequentially with one policy call per env
step (reference: train.py:196-250, collect_data.py eval loop). Through a
remote-TPU link every call costs a round trip, so N episodes of length T pay
N*T RTTs. Here all N episodes run in lockstep: one jitted policy call per
timestep serves the whole batch (T round trips total), and host MuJoCo
stepping for already-finished episodes is skipped while the batch shape stays
static for the jit.
"""

from __future__ import annotations

import numpy as np


class EvalEnvPool:
    """N independently-seeded copies of an eval env, stepped in lockstep."""

    def __init__(self, make_env, n: int):
        self.envs = [make_env(i) for i in range(n)]
        self.n = n

    def rollout(self, policy_fn, init_carry_fn, next_key_fn):
        """Run one episode in every env simultaneously.

        policy_fn(model_obs, carry, key) -> (action [N, A], carry) — jitted by
        the caller with the agent state closed over. Returns (rewards [N],
        lengths [N]) of the completed episodes.
        """
        obs = [env.reset()[1] for env in self.envs]
        carry = init_carry_fn(self.n)
        totals = np.zeros(self.n, np.float64)
        lengths = np.zeros(self.n, np.int64)
        done = np.array([o["is_last"] for o in obs], bool)
        while not done.all():
            action, carry = policy_fn(self._batch_obs(obs), carry, next_key_fn())
            action = np.asarray(action)
            for i, env in enumerate(self.envs):
                if done[i]:
                    continue  # keep last obs in the batch; skip host physics
                _, obs[i] = env.step(action[i])
                totals[i] += obs[i]["reward"]
                lengths[i] += 1
                done[i] = bool(obs[i]["is_last"])
        return totals, lengths

    def _batch_obs(self, obs):
        imgs = []
        for o in obs:
            img = o["observation"]
            if img.ndim == 3 and img.shape[0] in (1, 3):
                img = np.transpose(img, (1, 2, 0))
            imgs.append(img)
        return {
            "observation": np.stack(imgs),
            "is_first": np.asarray([o["is_first"] for o in obs]),
            "is_terminal": np.asarray([o["is_terminal"] for o in obs]),
            "reward": np.asarray(
                [[np.float32(o["reward"] or 0.0)] for o in obs]),
        }
