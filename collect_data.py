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

        # N lockstep collection envs: one batched policy call per timestep
        # serves all of them, amortizing the policy round trip (~44% of the
        # single-env step time on a remote-TPU link) across N frames. The
        # replay keeps per-env episode accounting via add(..., env_id).
        self.n_envs = max(1, int(cfg.get("num_collect_envs", 1)))
        self.envs = [
            envs.make(
                cfg.task, cfg.obs_type, int(cfg.action_repeat),
                int(cfg.seed) + 97 * i,
                img_size=int(cfg.img_size), viclip_encode=bool(cfg.viclip_encode),
                clip_hd_rendering=bool(cfg.clip_hd_rendering))
            for i in range(self.n_envs)]
        self.env = self.envs[0]
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
        elif cfg.get("snapshot_load_dir"):
            # warm start the WORLD MODEL from a foreign snapshot (e.g. a
            # GenRL WM-pretrain run) while the acting behavior + optimizer
            # start fresh and counters start at 0 — cuts the from-scratch
            # WM-learning plateau of online collection. Requires matching
            # model hyperparameters (e.g. conf/defaults=genrl here too).
            from genrl_tpu.utils.checkpoint import load_wm_subtree

            wm = load_wm_subtree(Path(cfg.snapshot_load_dir),
                                 self.state.wm_params)
            self.state = shard_params(self.state.replace(wm_params=wm),
                                      self.mesh)

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

    def _obs_to_model(self, obs_list):
        """List of CHW uint8 obs dicts -> [N, H, W, C] device-ready batch."""
        imgs = []
        for o in obs_list:
            img = o["observation"]
            if img.ndim == 3 and img.shape[0] in (1, 3):
                img = np.transpose(img, (1, 2, 0))
            imgs.append(img)
        return {
            "observation": np.stack(imgs),
            "is_first": np.asarray([o["is_first"] for o in obs_list]),
            "is_terminal": np.asarray([o["is_terminal"] for o in obs_list]),
            "reward": np.asarray(
                [[np.float32(o["reward"] or 0.0)] for o in obs_list]),
        }

    def train(self):
        from genrl_tpu.utils.schedules import Crossed, Until

        cfg = self.cfg
        ar = int(cfg.action_repeat)
        N = self.n_envs
        train_until = Until(int(cfg.num_train_frames), ar)
        seed_until = Until(int(cfg.num_seed_frames), ar)
        # boundary-crossing predicates: with N lockstep envs global_step
        # advances by N per iteration and can step OVER exact multiples
        should_log = Crossed(int(cfg.log_every_frames), ar)
        should_save = Crossed(int(cfg.save_every_frames), ar)
        train_every = int(cfg.get("train_every_actions", 10))
        only_random = bool(cfg.get("only_random_actions", False))
        eval_every = Crossed(int(cfg.eval_every_frames), ar)

        import time

        obs = [env.reset()[1] for env in self.envs]
        carry = self.agent.init_policy_carry(N)
        episode_reward = [0.0] * N
        episode_len = [0] * N
        metrics = {}
        trained_at = self.global_step  # train-every-N accounting across envs
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
            if (cfg.get("eval_modality") == "task"
                    and eval_every(self.global_step)):
                self.eval()
            mark("other")
            for i, env in enumerate(self.envs):
                if not obs[i]["is_last"]:
                    continue
                # viclip accumulate flush (reference: collect_data.py:240-247):
                # embeds[-1] rides the FINAL transition; embeds[:-1] backfill
                # the ongoing tail so each frame pairs with the window that
                # ENDS at it (same alignment as reference datasets)
                final_obs = dict(obs[i], is_last=True)
                if hasattr(env, "process_accumulate"):
                    embeds, key = env.process_accumulate()
                    if embeds:
                        self.replay.attach_key(key, embeds[:-1], env_id=i)
                        final_obs[key] = np.asarray(embeds[-1])
                self.replay.add(final_obs, env_id=i)
                mark("flush")
                self.global_episode += 1
                self.logger.log("train/episode_reward", episode_reward[i],
                                self.global_step)
                self.logger.log("train/episode_length", episode_len[i] * ar,
                                self.global_step)
                _, obs[i] = env.reset()
                # the policy carry resets itself: obs_step masks the latent
                # and prev_action on is_first (rssm.obs_step), so the fresh
                # reset obs clears env i's carry row on the next policy call
                episode_reward[i], episode_len[i] = 0.0, 0
            for i in range(N):
                self.replay.add(obs[i], env_id=i)

            if seed_until(self.global_step) or only_random:
                actions = [env.act_space["action"].sample()
                           for env in self.envs]
            else:
                action, carry = self._jit_policy(
                    self.state, self._obs_to_model(obs), carry,
                    self._next_key())
                action = np.asarray(action)
                actions = [action[i] for i in range(N)]
            mark("policy")

            # one train call per train_every actions taken (summed across the
            # lockstep envs), preserving the reference's grad-step : frame
            # ratio for any N
            if not seed_until(self.global_step) and len(self.replay):
                while self.global_step - trained_at >= train_every:
                    trained_at += train_every
                    if self.device_ring is not None and len(self.device_ring):
                        ring = self.device_ring
                        self.state, metrics = self._jit_train_ring(
                            self.state, ring.arrays, ring.ep_len, ring.count,
                            self._ring_base, trained_at)
                    else:
                        batch = self.replay.sample_batch(int(cfg.batch_size),
                                                         int(cfg.batch_length))
                        self.state, metrics = self._jit_train(
                            self.state, batch, self._next_key())
            else:
                trained_at = self.global_step
            mark("train")

            for i, env in enumerate(self.envs):
                _, obs[i] = env.step(actions[i])
                episode_reward[i] += obs[i]["reward"]
                episode_len[i] += 1
            mark("env")
            self.global_step += N

            if should_log(self.global_step):
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
    from genrl_tpu.parallel import honor_platform_env
    from genrl_tpu.utils.config import compose

    honor_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(PRESETS, COLLECT_BASE, argv)
    Workspace(cfg).train()


if __name__ == "__main__":
    main()
