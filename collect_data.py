"""Online data collector CLI (Plan2Explore / Dreamer).

Rebuild of the reference collector (collect_data.py:41-326): an
env-interaction loop with a random seed phase, train-every-N-actions agent
updates, episode logging and ViCLIP accumulate-flush at episode end.
Usage mirrors the reference:

    python collect_data.py agent=plan2explore task=stickman_walk \
        num_train_frames=2000010

TPU-native: acting runs through the jitted policy_step; training steps are
one jitted program on the device mesh while env stepping stays host-side
(MuJoCo C physics off the TPU critical path).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


class Workspace:
    def __init__(self, cfg, work_dir=None):
        import jax

        from genrl_tpu import envs
        from genrl_tpu.agents.assembly import make_agent
        from genrl_tpu.data import ReplayBuffer
        from genrl_tpu.parallel import make_mesh, shard_params
        from genrl_tpu.utils.checkpoint import SnapshotManager
        from genrl_tpu.utils.logger import Logger
        from genrl_tpu.utils.schedules import Timer, set_seed_everywhere

        self.cfg = cfg
        self.work_dir = Path(work_dir or cfg.get("workdir") or "exp_local_collect") / str(cfg.task)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        print(f"workspace: {self.work_dir}")
        from genrl_tpu.utils.checkpoint import save_run_config

        save_run_config(self.work_dir, cfg)  # search index for snapshot_search_dir
        set_seed_everywhere(int(cfg.seed))
        self.logger = Logger(self.work_dir, use_tb=cfg.use_tb, use_wandb=cfg.use_wandb)
        self.timer = Timer()

        self.env = envs.make(
            cfg.task, cfg.obs_type, int(cfg.action_repeat), int(cfg.seed),
            img_size=int(cfg.img_size), viclip_encode=bool(cfg.viclip_encode),
            clip_hd_rendering=bool(cfg.clip_hd_rendering))
        obs_space = {"observation": tuple(np.asarray(
            self.env.obs_space["observation"].shape))}
        # stored CHW -> model HWC
        if len(obs_space["observation"]) == 3:
            c, h, w = obs_space["observation"]
            obs_space["observation"] = (h, w, c)
        act_dim = int(np.prod(self.env.act_space["action"].shape))

        self.replay = ReplayBuffer(
            directory=self.work_dir / "buffer",
            length=int(cfg.batch_length),
            capacity=int(cfg.replay.capacity),
            minlen=int(cfg.replay.minlen),
            seed=int(cfg.seed),
        )
        # device-resident online ring: each completed episode uploads ONCE to
        # HBM and train batches are gathered inside the train jit — a train
        # call ships scalars instead of a [B, L] host batch (~10 MB at 16x50
        # 64px, the dominant cost per train call on a remote-TPU link)
        self.device_ring = None
        if bool(cfg.get("replay_device", True)):
            from genrl_tpu.data.device_replay import DeviceRing

            maxlen = int(cfg.get("replay_device_maxlen",
                                 1000 // int(cfg.action_repeat) + 1))
            self.device_ring = DeviceRing(
                capacity=int(cfg.get("replay_device_episodes", 400)),
                maxlen=maxlen, length=int(cfg.batch_length),
                keys=("observation", "action", "reward", "discount",
                      "is_first", "is_terminal"))
            self.replay.on_episode = self.device_ring.add_episode
            # re-ingest episodes already on disk (crash recovery path)
            for ep in self.replay.episodes()[-self.device_ring.capacity:]:
                self.device_ring.add_episode(ep)

        self.mesh = make_mesh(**dict(cfg.get("mesh", {"data": 1, "model": 1}),
                                     data=1))
        self.agent = make_agent(cfg, obs_space, act_dim)
        self.state = shard_params(self.agent.init(
            jax.random.PRNGKey(int(cfg.seed))), self.mesh)
        self.snap = SnapshotManager(self.work_dir / "snapshots")
        self._key = jax.random.PRNGKey(int(cfg.seed) + 7)
        self.global_step = 0
        self.global_episode = 0
        # crash recovery (reference: collect_data.py:316-319): resume from the
        # last snapshot if one exists; buffer/ NPZs were already re-ingested
        # by the ReplayBuffer ctor above
        if self.snap.exists():
            loaded = self.snap.load(jax.tree_util.tree_map(np.asarray, self.state))
            if loaded is not None:
                state, counters = loaded
                self.state = shard_params(state, self.mesh)
                self.global_step = int(counters.get("step", 0))
                self.global_episode = int(counters.get("episode", 0))
                print(f"resuming collector: step={self.global_step} "
                      f"episode={self.global_episode} "
                      f"buffer_episodes={len(self.replay)}")

        self._jit_policy = jax.jit(self.agent.policy_step,
                                   static_argnames=("eval_mode",))
        self._jit_train = jax.jit(self.agent.train_step, donate_argnums=(0,))
        if self.device_ring is not None:
            from genrl_tpu.data.device_replay import sample_windows

            self._ring_base = jax.random.PRNGKey(int(cfg.seed) + 99)

            def _train_ring(s, arrays, ep_len, n_valid, base, step):
                k1, k2 = jax.random.split(jax.random.fold_in(base, step))
                batch = sample_windows(arrays, ep_len, k1,
                                       int(cfg.batch_size),
                                       int(cfg.batch_length), None, n_valid)
                return self.agent.train_step(s, batch, k2)

            self._jit_train_ring = jax.jit(_train_ring, donate_argnums=(0,))
        self._eval_pool = None

    # ---- eval (reference: collect_data.py eval loop, eval_modality='task') ----
    def eval(self):
        """Batched lockstep eval: one policy call per timestep serves all
        num_eval_episodes (utils/evaluation.py)."""
        from genrl_tpu import envs
        from genrl_tpu.utils.evaluation import EvalEnvPool
        from genrl_tpu.utils.task_scores import MAX, normalized_score

        cfg = self.cfg
        if self._eval_pool is None:
            def make(i):
                env = envs.make(
                    cfg.task, cfg.obs_type, int(cfg.action_repeat),
                    int(cfg.seed) + 1000 + i, img_size=int(cfg.img_size))
                if hasattr(env, "eval_mode"):
                    env.eval_mode()
                return env

            self._eval_pool = EvalEnvPool(make, int(cfg.num_eval_episodes))
        rewards, lengths = self._eval_pool.rollout(
            lambda o, c, k: self._jit_policy(self.state, o, c, k,
                                             eval_mode=True),
            self.agent.init_policy_carry, self._next_key)
        mean_reward = float(np.mean(rewards))
        with self.logger.log_and_dump_ctx(self.global_step, ty="eval") as log:
            log("episode_reward", mean_reward)
            log("episode_length", float(np.mean(lengths)) * int(cfg.action_repeat))
            log("step", self.global_step)
            if cfg.task in MAX:
                log("normalized_score", normalized_score(cfg.task, mean_reward))
        return mean_reward

    def _next_key(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    def _obs_to_model(self, obs):
        """CHW uint8 -> [1, H, W, C] device-ready policy obs."""
        img = obs["observation"]
        if img.ndim == 3 and img.shape[0] in (1, 3):
            img = np.transpose(img, (1, 2, 0))
        return {
            "observation": img[None],
            "is_first": np.asarray([obs["is_first"]]),
            "is_terminal": np.asarray([obs["is_terminal"]]),
            "reward": np.asarray([[np.float32(obs["reward"] or 0.0)]]),
        }

    def train(self):
        from genrl_tpu.utils.schedules import Every, Until

        cfg = self.cfg
        ar = int(cfg.action_repeat)
        train_until = Until(int(cfg.num_train_frames), ar)
        seed_until = Until(int(cfg.num_seed_frames), ar)
        should_log = Every(int(cfg.log_every_frames), ar)
        should_save = Every(int(cfg.save_every_frames), ar)
        train_every = int(cfg.get("train_every_actions", 10))
        only_random = bool(cfg.get("only_random_actions", False))
        eval_every = Every(int(cfg.eval_every_frames), ar)

        import time

        ts, obs = self.env.reset()
        carry = self.agent.init_policy_carry(1)
        episode_reward, episode_len = 0.0, 0
        metrics = {}
        # per-phase wall-time accumulators, dumped per log window (SURVEY §5.1
        # tracing parity: the reference logs only fps; we break the step down)
        phase = {"env": 0.0, "policy": 0.0, "train": 0.0, "flush": 0.0,
                 "other": 0.0}
        t_mark = time.time()

        def mark(name):
            nonlocal t_mark
            now = time.time()
            phase[name] += now - t_mark
            t_mark = now

        while train_until(self.global_step):
            if (self.global_step > 0 and cfg.get("eval_modality") == "task"
                    and eval_every(self.global_step)):
                self.eval()
            mark("other")
            if obs["is_last"]:
                # viclip accumulate flush (reference: collect_data.py:240-247):
                # embeds[-1] rides the FINAL transition; embeds[:-1] backfill
                # the ongoing tail so each frame pairs with the window that
                # ENDS at it (same alignment as reference datasets)
                final_obs = dict(obs, is_last=True)
                if hasattr(self.env, "process_accumulate"):
                    embeds, key = self.env.process_accumulate()
                    if embeds:
                        self.replay.attach_key(key, embeds[:-1])
                        final_obs[key] = np.asarray(embeds[-1])
                self.replay.add(final_obs)
                mark("flush")
                self.global_episode += 1
                self.logger.log("train/episode_reward", episode_reward, self.global_step)
                self.logger.log("train/episode_length", episode_len * ar, self.global_step)
                ts, obs = self.env.reset()
                carry = self.agent.init_policy_carry(1)
                episode_reward, episode_len = 0.0, 0
            self.replay.add(obs)

            if seed_until(self.global_step) or only_random:
                action = self.env.act_space["action"].sample()
            else:
                action, carry = self._jit_policy(
                    self.state, self._obs_to_model(obs), carry, self._next_key())
                action = np.asarray(action[0])
            mark("policy")

            if (not seed_until(self.global_step)
                    and self.global_step % train_every == 0
                    and len(self.replay)):
                if self.device_ring is not None and len(self.device_ring):
                    ring = self.device_ring
                    self.state, metrics = self._jit_train_ring(
                        self.state, ring.arrays, ring.ep_len, ring.count,
                        self._ring_base, self.global_step)
                else:
                    batch = self.replay.sample_batch(int(cfg.batch_size),
                                                     int(cfg.batch_length))
                    self.state, metrics = self._jit_train(self.state, batch,
                                                          self._next_key())
            mark("train")

            ts, obs = self.env.step(action)
            mark("env")
            episode_reward += obs["reward"]
            episode_len += 1
            self.global_step += 1

            if self.global_step > 0 and should_log(self.global_step):
                host = {k: float(np.asarray(v)) for k, v in metrics.items()}
                host.update({k: float(v) for k, v in self.replay.stats.items()})
                if self.device_ring is not None:
                    host.update({k: float(v) for k, v
                                 in self.device_ring.stats.items()})
                self.logger.log_metrics(host, self.global_step, ty="train")
                elapsed, total = self.timer.reset()
                with self.logger.log_and_dump_ctx(self.global_step, "train") as log:
                    log("fps", int(cfg.log_every_frames) / ar / max(elapsed, 1e-9))
                    log("step", self.global_step)
                    log("episode", self.global_episode)
                    log("total_time", total)
                    window = max(sum(phase.values()), 1e-9)
                    for k, v in phase.items():
                        log(f"time_{k}_pct", 100.0 * v / window)
                        phase[k] = 0.0
            if should_save(self.global_step):
                self.snap.save(self.state, {"step": self.global_step,
                                            "episode": self.global_episode})
        self.snap.save(self.state, {"step": self.global_step,
                                    "episode": self.global_episode})
        self.snap.wait_until_finished()


def main(argv=None):
    from genrl_tpu.configs import COLLECT_BASE, PRESETS
    from genrl_tpu.utils.config import compose

    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(PRESETS, COLLECT_BASE, argv)
    Workspace(cfg).train()


if __name__ == "__main__":
    main()
