"""Offline world-model / connector / behavior trainer CLI.

Rebuild of the reference trainer (train.py:39-452) with its public override
grammar, e.g.:

    python train.py task=stickman_walk replay_load_dir=data/stickman_example \
        train_world_model=True train_connector=True num_train_frames=500010
    python train.py task=stickman_walk agent.imag_reward_fn=video_text_reward \
        batch_size=32 batch_length=32 snapshot_load_dir=...

Differences by design (TPU-native):
  * One jitted train step per phase (WM+connector fused; behavior fused with
    reward + imagination), pjit-sharded over a (data, model) mesh.
  * The unconditional prompt target is computed once per behavior phase and
    fed into the jit as an argument (the reference caches it on the agent,
    tools/genrl_utils.py:289-321).
  * Snapshots are orbax pytrees, not module pickles.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np


class Workspace:
    def __init__(self, cfg, work_dir=None):
        import jax

        from genrl_tpu.agents.assembly import make_agent
        from genrl_tpu.data import ReplayBuffer
        from genrl_tpu.parallel import batch_sharding, make_mesh, shard_state
        from genrl_tpu.utils.checkpoint import SnapshotManager, apply_resets
        from genrl_tpu.utils.logger import Logger
        from genrl_tpu.utils.schedules import Timer, set_seed_everywhere

        self.cfg = cfg
        self.work_dir = Path(work_dir or cfg.get("workdir") or "exp_local") / str(cfg.task)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        print(f"workspace: {self.work_dir}")
        from genrl_tpu.utils.checkpoint import save_run_config

        save_run_config(self.work_dir, cfg)  # search index for snapshot_search_dir
        set_seed_everywhere(int(cfg.seed))
        self.logger = Logger(self.work_dir, use_tb=cfg.use_tb, use_wandb=cfg.use_wandb)
        self.timer = Timer()

        # ---- replay ----------------------------------------------------------
        self.replay = None
        self.replay_iter = None
        self.device_replay = None
        if cfg.get("train_from_data", True):
            load_dir = cfg.get("replay_load_dir") or (self.work_dir / "buffer")
            self.replay = ReplayBuffer(
                directory=load_dir,
                length=int(cfg.batch_length),
                capacity=int(cfg.replay.capacity),
                minlen=int(cfg.replay.minlen),
                load_recursive=True,
                seed=int(cfg.seed),
            )
            if len(self.replay) == 0:
                raise SystemExit(f"no episodes found in {load_dir}")
            self._replay_load_dir = load_dir

        # ---- mesh + agent -------------------------------------------------------
        import math

        mesh_cfg = dict(cfg.get("mesh", {"data": -1, "model": 1}))
        # mesh.zero1: ZeRO-1 optimizer-state sharding over the batch axes
        # (genrl_tpu/parallel/mesh.py:state_shardings; make_mesh ignores it)
        self.zero1 = bool(mesh_cfg.get("zero1", False))
        if mesh_cfg.get("data", -1) == -1:
            # the batch axes must divide the batch; clamp to gcd(batch, devices)
            denom = max(1, int(mesh_cfg.get("model", 1))
                        * int(mesh_cfg.get("dcn", 1)))
            n_avail = len(jax.devices()) // denom
            mesh_cfg["data"] = math.gcd(
                int(cfg.batch_size) // max(1, int(mesh_cfg.get("dcn", 1))),
                n_avail)
        self.mesh = make_mesh(**mesh_cfg)
        # embedding whitening (see genrl_tpu/rewards/embed_stats.py): one
        # consistent mean-center+renorm over the dataset's clip_video and the
        # prompt embed. Stats priority: (1) the pretrain run's embed_stats.npz
        # next to snapshot_load_dir — the connector was trained in THAT
        # whitened space, so behavior/finetune/data-free phases must reuse it
        # even when their own dataset differs; (2) computed from this run's
        # dataset. Either way the stats are saved next to this run's
        # snapshots so downstream phases can chain.
        self._embed_mean = None
        transforms = None
        if cfg.get("embed_whiten", False):
            from genrl_tpu.rewards import embed_stats as _es

            load_dir = cfg.get("snapshot_load_dir")
            if load_dir and (Path(load_dir) / _es.STATS_FILENAME).exists():
                self._embed_mean = _es.load_stats(load_dir)["mean"]
                print(f"embed whitening: pretrain stats reused from {load_dir}")

            def _whiten_clip(buf):
                if self._embed_mean is None:
                    self._embed_mean = _es.compute_embed_mean(buf)
                return _es.whiten(buf, self._embed_mean)

            transforms = {"clip_video": _whiten_clip}
        if self.replay is not None and cfg.get("replay_device", True):
            # device-resident store: sampling fuses into the train jit, zero
            # steady-state H2D (the streaming path is feed-bound on slow host
            # links). Falls back when the dataset exceeds HBM.
            from genrl_tpu.data.device_replay import DeviceReplay
            from genrl_tpu.parallel import replicated

            try:
                self.device_replay = DeviceReplay(
                    self._replay_load_dir, int(cfg.batch_length),
                    minlen=int(cfg.replay.minlen), load_recursive=True,
                    sharding=replicated(self.mesh), transforms=transforms)
                print(f"replay: device-resident "
                      f"({self.device_replay.stats['loaded_episodes']} episodes)")
            except (MemoryError, ValueError) as e:
                print(f"replay: streaming (device store unavailable: {e})")
        if cfg.get("embed_whiten", False):
            from genrl_tpu.rewards import embed_stats as _es

            if self._embed_mean is None and self.replay is not None:
                seqs = [ep["clip_video"] for ep in self.replay.episodes()
                        if "clip_video" in ep]
                if seqs:
                    self._embed_mean = _es.compute_embed_mean(seqs)
            if self._embed_mean is None:
                raise SystemExit(
                    "embed_whiten=True without dataset embeddings needs "
                    "snapshot_load_dir pointing at a pretrain run "
                    "(embed_stats.npz)")
            if self.replay is not None:
                # keep the host-side streaming buffer (report/eval consumers)
                # in the same whitened space as the device store / prompt
                mean = self._embed_mean
                self.replay.transform_key(
                    "clip_video", lambda x: _es.whiten(x, mean))
            _es.save_stats(self.work_dir / "snapshots", self._embed_mean)
        obs_space, act_dim = self._spaces()
        self.agent = make_agent(cfg, obs_space, act_dim)
        if cfg.get("finetune", False):
            # finetune phase (reference: GenRLAgent.finetune_mode,
            # agent/genrl.py:55-59): the imag behavior becomes the acting
            # behavior, connector updates stop, the reward head joins the
            # gradient heads and trains on env data. Must happen before the
            # template init so the jitted loss sees the new grad_heads.
            from genrl_tpu.agents.assembly import GenRLAgent as _G

            if not isinstance(self.agent, _G):
                raise SystemExit("finetune=True requires agent=genrl")
            self.agent.finetune_mode()
            print("finetune mode: reward head in grad_heads, connector frozen,"
                  " imag behavior trains on env reward")

        self.snap = SnapshotManager(self.work_dir / "snapshots")
        key = jax.random.PRNGKey(int(cfg.seed))
        self._key = key
        self.global_step = 0
        self.global_episode = 0

        template = self.agent.init(jax.random.PRNGKey(int(cfg.seed)))
        state = None
        # resume from own workdir first (crash recovery), else load external
        if self.snap.exists():
            loaded = self.snap.load(template)
            if loaded is not None:
                state, counters = loaded
                self.global_step = int(counters.get("step", 0))
                self.global_episode = int(counters.get("episode", 0))
                print(f"resumed from {self.snap.root} at step {self.global_step}")
        elif cfg.get("torch_snapshot_path"):
            # convert-on-load of reference PyTorch whole-module snapshots
            # (e.g. published genrl_stickman_500k_2.pt)
            from genrl_tpu.utils.torch_import import import_reference_snapshot

            state, counters = import_reference_snapshot(
                cfg.torch_snapshot_path, self.agent, template)
            print(f"imported reference torch snapshot {cfg.torch_snapshot_path} "
                  f"(step {counters['step']})")
        elif cfg.get("snapshot_search_dir"):
            # config-matching workdir search — the zero-egress equivalent of
            # the reference's wandb run search (train.py:72-133): same match
            # keys (task/seed/agent + connector noise params), resolved
            # against config.json files instead of wandb run metadata
            from genrl_tpu.utils.checkpoint import SnapshotManager as SM
            from genrl_tpu.utils.checkpoint import search_snapshot

            match = {
                "task": str(cfg.get("task_snapshot") or cfg.task),
                "seed": int(cfg.seed if cfg.get("seed_snapshot") is None
                            else cfg.seed_snapshot),
                "agent.name": str(cfg.get("agent_name_snapshot") or cfg.agent.name),
            }
            if float(cfg.agent.get("clip_lafite_noise", 0.0)) > 0:
                match["agent.clip_lafite_noise"] = float(cfg.agent.clip_lafite_noise)
            if (float(cfg.agent.get("clip_add_noise", 0.0)) > 0
                    and not cfg.get("reset_connector", False)):
                match["agent.clip_add_noise"] = float(cfg.agent.clip_add_noise)
            found = search_snapshot(cfg.snapshot_search_dir, match,
                                    cfg.get("snapshot_step"))
            if found is None:
                raise SystemExit(
                    f"no workdir matching {match} under {cfg.snapshot_search_dir}")
            if found.name.startswith("snapshot_"):
                loaded = SM(found.parent).load(template, path=found)
            else:
                loaded = SM(found).load(template)
            state, _ = loaded
            state = apply_resets(
                self.agent, state, jax.random.PRNGKey(int(cfg.seed) + 1),
                reset_world_model=cfg.get("reset_world_model", False),
                reset_connector=cfg.get("reset_connector", False),
                reset_imag_behavior=cfg.get("reset_imag_behavior", False),
            )
            print(f"loaded snapshot via config search: {found}")
        elif cfg.get("snapshot_load_dir") and cfg.get("load_wm_only"):
            # cross-agent graft: take ONLY wm_params from the donor snapshot
            # (e.g. a Dreamer collector whose WM trained online) into this
            # agent's fresh state — connector/behaviors/optimizers start fresh
            from genrl_tpu.utils.checkpoint import load_wm_subtree

            wm = load_wm_subtree(Path(cfg.snapshot_load_dir), template.wm_params)
            state = template.replace(wm_params=wm)
        elif cfg.get("snapshot_load_dir"):
            from genrl_tpu.utils.checkpoint import SnapshotManager as SM

            ext = SM(Path(cfg.snapshot_load_dir))
            loaded = ext.load(template)
            if loaded is None:
                raise SystemExit(f"no snapshot found in {cfg.snapshot_load_dir}")
            state, _ = loaded
            state = apply_resets(
                self.agent, state, jax.random.PRNGKey(int(cfg.seed) + 1),
                reset_world_model=cfg.get("reset_world_model", False),
                reset_connector=cfg.get("reset_connector", False),
                reset_imag_behavior=cfg.get("reset_imag_behavior", False),
            )
            print(f"loaded snapshot from {cfg.snapshot_load_dir}")
        self.state = shard_state(state if state is not None else template,
                                 self.mesh, zero1=self.zero1)
        self.batch_sharding = batch_sharding(self.mesh)

        # host batch feed is built LAZILY: with device-resident replay the
        # train loop never consumes it (sampling is fused into the train jit)
        # and eager prefetch workers would burn host RAM/CPU filling a queue
        # nobody reads — only report_visuals (and the streaming path) want it

    # ---- helpers -------------------------------------------------------------------
    def _replay_iter(self):
        if self.replay_iter is None and self.replay is not None:
            import jax

            # multi-host: each process samples its local share of the global
            # batch from its own episode shard (put_process_local_batch in
            # the feed assembles the global array without cross-host copies)
            n_proc = jax.process_count()
            if int(self.cfg.batch_size) % n_proc:
                raise SystemExit(
                    f"batch_size {self.cfg.batch_size} must divide evenly "
                    f"across {n_proc} processes")
            local_bs = int(self.cfg.batch_size) // n_proc
            self.replay_iter = self.replay.dataset(
                local_bs, int(self.cfg.batch_length),
                sharding=self.batch_sharding, prefetch=4, num_workers=2)
        return self.replay_iter

    def _spaces(self):
        cfg = self.cfg
        if self.replay is not None and len(self.replay):
            ep = next(iter(self.replay._episodes.values()))
            img = ep["observation"].shape
            if len(img) == 4 and img[1] in (1, 3):  # stored CHW
                obs_shape = (img[2], img[3], img[1])
            else:
                obs_shape = tuple(img[1:])
            act_dim = ep["action"].shape[-1]
        else:
            obs_shape = (int(cfg.img_size), int(cfg.img_size), 3)
            act_dim = int(cfg.get("act_dim", 10))
        return {"observation": obs_shape}, act_dim

    def _next_key(self):
        import jax

        self._key, sub = jax.random.split(self._key)
        return sub

    def _prompt_embed(self):
        """Text/video prompt embedding for the behavior target. Prefers an
        explicit file (prompt_embed_path: .npy with [E]); else uses the
        InternVideo2 JAX encoder on TASK2PROMPT[task]."""
        cfg = self.cfg
        path = cfg.get("prompt_embed_path")
        if path:
            emb = np.load(path).reshape(-1).astype(np.float32)
            emb = emb / max(np.linalg.norm(emb), 1e-8)
        else:
            from genrl_tpu.models.internvideo2 import get_global_instance
            from genrl_tpu.rewards import resolve_reward

            spec = resolve_reward(cfg.agent.get("imag_reward_fn"))
            clip = get_global_instance(cfg.get("viclip_model", "internvideo2"),
                                       models_root=cfg.get("models_root", "models"))
            emb = spec.prompt_embed(clip, cfg, cfg.task)
        if self._embed_mean is not None:
            # same whitening as the stored clip_video sequences (the
            # connector's conditioning space) — see rewards/embed_stats.py
            from genrl_tpu.rewards.embed_stats import whiten

            emb = whiten(np.asarray(emb).reshape(-1), self._embed_mean)
        return emb

    def _demo_window(self):
        """Load the demo window npz for target_from=posterior: the .npz
        sibling of task_video (written by scripts/make_video_prompt.py),
        or an explicit demo_npz path. Slices to imag_horizon+1 steps around
        the window's best-reward start so the target length matches the
        connector route's."""
        import jax.numpy as jnp

        from genrl_tpu.utils.demo import load_demo_window

        cfg = self.cfg
        path = cfg.get("demo_npz") or str(
            Path(cfg.get("task_video", "")).with_suffix(".npz"))
        # imag_horizon is a root config key (configs.py presets)
        demo = load_demo_window(path, int(cfg.imag_horizon) + 1)
        return {k: jnp.asarray(v) for k, v in demo.items()}

    # ---- eval --------------------------------------------------------------------------
    def _eval_pool(self):
        if getattr(self, "_eval_pool_cache", None) is None:
            from genrl_tpu import envs
            from genrl_tpu.utils.evaluation import EvalEnvPool

            def make(i):
                env = envs.make(
                    self.cfg.task, self.cfg.get("obs_type", "pixels"),
                    int(self.cfg.action_repeat), int(self.cfg.seed) + 1000 + i,
                    img_size=int(self.cfg.img_size))
                if hasattr(env, "eval_mode"):
                    # kitchen evaluates sparse with early stop (envs/main.py:393-395)
                    env.eval_mode()
                return env

            self._eval_pool_cache = EvalEnvPool(
                make, int(self.cfg.num_eval_episodes))
        return self._eval_pool_cache

    def eval(self, use_imag: bool = False):
        """Env-rollout evaluation with the acting (or imag) policy
        (reference: Workspace.eval / eval_imag_behavior, train.py:196-250).
        All num_eval_episodes run in lockstep: one jitted policy call per env
        timestep serves the whole batch (utils/evaluation.py)."""
        import jax

        from genrl_tpu.agents.assembly import GenRLAgent
        from genrl_tpu.utils.task_scores import MAX, normalized_score

        pool = self._eval_pool()
        # cache the jitted policy per use_imag flag: a fresh jit wrapper per
        # eval() would miss jax's compile cache (keyed on fn identity) and
        # recompile on every evaluation
        cache = getattr(self, "_eval_pol_cache", None) or {}
        self._eval_pol_cache = cache
        pol = cache.get(use_imag)
        if pol is None:
            if isinstance(self.agent, GenRLAgent):
                pol = jax.jit(lambda s, o, c, k: self.agent.policy_step(
                    s, o, c, k, eval_mode=True, use_imag=use_imag))
            else:
                pol = jax.jit(lambda s, o, c, k: self.agent.policy_step(
                    s, o, c, k, eval_mode=True))
            cache[use_imag] = pol
        rewards, lengths = pool.rollout(
            lambda o, c, k: pol(self.state, o, c, k),
            self.agent.init_policy_carry, self._next_key)
        mean_reward = float(np.mean(rewards))
        with self.logger.log_and_dump_ctx(self.global_step, ty="eval") as log:
            log("episode_reward", mean_reward)
            log("episode_length", float(np.mean(lengths))
                * int(self.cfg.action_repeat))
            log("step", self.global_step)
            if self.cfg.task in MAX:
                log("normalized_score", normalized_score(self.cfg.task, mean_reward))
        return mean_reward

    def report_visuals(self):
        """Open-loop + connector prediction panels (reference:
        train.py:357-360 -> agent.report)."""
        if self._replay_iter() is None:
            return
        batch = next(self._replay_iter())
        videos = self.agent.report(self.state, batch, self._next_key())
        self.logger.log_visual(
            {k: np.asarray(v) for k, v in videos.items()}, self.global_step)

    # ---- train ------------------------------------------------------------------------
    def train(self):
        import jax

        from genrl_tpu.utils.schedules import Every, Until

        cfg = self.cfg
        train_until = Until(int(cfg.num_train_frames), 1)
        should_log = Every(int(cfg.log_every_frames), 1)
        should_save = Every(int(cfg.save_every_frames), 1)
        snapshot_every = int(cfg.snapshot_every_frames)

        use_behavior = cfg.agent.get("imag_reward_fn") is not None
        target = None
        imag_env = False
        if use_behavior:
            from genrl_tpu.rewards import resolve_reward

            spec = resolve_reward(cfg.agent.imag_reward_fn)
            if spec.needs_target:
                B = int(cfg.batch_size) * int(cfg.batch_length)
                args = dict(cfg.agent.imag_reward_args)
                if args.get("target_from", "connector") == "posterior":
                    # demonstration-window target: encode the prompt video's
                    # own (obs, action) slice through the WM posterior instead
                    # of the connector (see make_posterior_target docstring;
                    # requires the .npz make_video_prompt.py writes)
                    target = self.agent.make_posterior_target(
                        self.state, self._demo_window(), batch=B, key=self._next_key())
                else:
                    embed = self._prompt_embed()
                    target = self.agent.make_unconditional_target(
                        self.state, jax.numpy.asarray(embed), batch=B, key=self._next_key(),
                        sample_for_target=bool(args.get("sample_for_target", False)),
                        skip_first_target=bool(args.get("skip_first_target", True)),
                    )
            else:
                # imag_reward_fn=env_reward: imag behavior trained on the
                # reward head, no prompt target (reference resolves the same
                # name through update_imag_behavior, agent/genrl.py:108-124)
                imag_env = True

        twm = bool(cfg.get("train_world_model", False))
        tconn = bool(cfg.get("train_connector", False))
        if cfg.get("finetune", False):
            twm = True  # finetuning trains WM (incl. reward head) on env data
        if not (twm or tconn or use_behavior):
            raise SystemExit(
                "nothing to train: set train_world_model/train_connector or agent.imag_reward_fn")
        step_fn = None
        if cfg.get("train_from_data", True):
            from genrl_tpu.agents.assembly import GenRLAgent

            # donating the state avoids param/opt pytree copies (~30% step time)
            if isinstance(self.agent, GenRLAgent):
                agent_step = lambda s, d, k: self.agent.train_step(
                    s, d, k, target_seq=target, train_world_model=twm,
                    train_connector=tconn, imag_env_reward=imag_env)
            else:
                agent_step = lambda s, d, k: self.agent.train_step(s, d, k)
            # the PRNG key is derived INSIDE the jit from the host step count:
            # a host-side jax.random.split would cost a device round trip per
            # step (expensive over remote-TPU links)
            base_key = jax.random.PRNGKey(int(cfg.seed) + 1234)
            if self.device_replay is not None:
                from genrl_tpu.data.device_replay import sample_windows

                dr = self.device_replay
                from genrl_tpu.parallel import data_size

                bs = self.batch_sharding if data_size(self.mesh) > 1 else None

                # Multi-step dispatch: K fused sample+update steps run as ONE
                # lax.scan inside ONE jitted program. The per-step host
                # dispatch (~a few ms on a slow host, a full RTT on a remote
                # TPU link) is paid once per chunk instead of once per grad
                # step — the device profile shows 5 ms/step of compute, so at
                # K=8 the host has 40 ms of slack per dispatch.
                #
                # Two tail cuts (r2 profile: 1.37 of 5.03 ms/step was window
                # sampling + metric reductions):
                #   * the K batch windows are gathered ONCE in the program
                #     prologue ([K*B, L] gather, reshaped to [K, B, L]) and
                #     fed to the scan as xs, instead of K separate gathers
                #     interleaved with the updates;
                #   * only the LAST step of the chunk computes metrics — the
                #     first K-1 scan iterations return none, so XLA dead-code
                #     eliminates their metric reductions (grad norms,
                #     entropies, KL means). Logged metrics are thus the
                #     chunk's last-step values, not a chunk mean; the logger's
                #     meters average across dispatches either way.
                def make_fused(n):
                    from genrl_tpu.data.device_replay import fused_chunk
                    from genrl_tpu.parallel import chunk_batch_sharding

                    step_bs = (chunk_batch_sharding(self.mesh)
                               if bs is not None else None)
                    fused = fused_chunk(
                        agent_step, n, int(cfg.batch_size),
                        int(cfg.batch_length), base_key,
                        jax.random.PRNGKey(int(cfg.seed) + 5678),
                        batch_sharding=step_bs)
                    return jax.jit(fused, donate_argnums=(0,))

                chunk_jits = {}
                step_fn = lambda s, d, t, i, n=1: chunk_jits.setdefault(
                    n, make_fused(n))(s, i, dr.arrays, dr.ep_len)
            else:
                plain_jit = jax.jit(
                    lambda s, d, base, step: agent_step(
                        s, d, jax.random.fold_in(base, step)),
                    donate_argnums=(0,))
                step_fn = lambda s, d, t, i, n=1: plain_jit(s, d, base_key, i)
        data_free_fn = None
        if not cfg.get("train_from_data", True):
            df_base = jax.random.PRNGKey(int(cfg.seed) + 4321)

            def make_data_free(n):
                def one(s, i):
                    return self.agent.train_step_data_free(
                        s, jax.random.fold_in(df_base, i), target,
                        int(cfg.batch_size), int(cfg.batch_length),
                        cfg.get("start_from_video", "mix"),
                        bool(cfg.get("mix_random_actions", True)),
                        int(cfg.get("imag_warmup_steps", 5)))

                def fused(s, step0):
                    # metrics only from the chunk's last step (the lean scan
                    # body lets XLA DCE the metric reductions, see make_fused)
                    def body(s, i):
                        s, _ = one(s, i)
                        return s, None

                    if n > 1:
                        s, _ = jax.lax.scan(
                            body, s, step0 + jax.numpy.arange(n - 1))
                    s, ms = one(s, step0 + n - 1)
                    return s, jax.tree_util.tree_map(
                        lambda x: x.astype(jax.numpy.float32), ms)

                return jax.jit(fused, donate_argnums=(0,))

            df_jits = {}
            data_free_fn = lambda s, i, n=1: df_jits.setdefault(
                n, make_data_free(n))(s, i)

        eval_every = Every(int(cfg.eval_every_frames), 1)
        visual_every = Every(int(cfg.visual_every_frames), 1)
        metrics = {}
        # profile=True captures a jax.profiler trace of steps 20..30 (past
        # compilation) into <work_dir>/profile — phases appear as the
        # named_scope labels from GenRLAgent.train_step (SURVEY.md §5.1)
        profile = bool(cfg.get("profile", False))
        prof_start, prof_stop = 20, 30

        # dispatch chunking only on the fully on-device paths (device-resident
        # replay / data-free); the streaming path needs a host batch per step
        on_device = self.device_replay is not None or not cfg.get(
            "train_from_data", True)
        max_chunk = max(1, int(cfg.get("steps_per_dispatch", 8))) if on_device else 1
        periods = [int(cfg.log_every_frames), int(cfg.eval_every_frames),
                   int(cfg.visual_every_frames), int(cfg.save_every_frames),
                   snapshot_every, 1000]  # 1000: the fixed early snapshot
        limit = int(cfg.num_train_frames)  # train.py frames == steps (Until(x, 1))

        def chunk_len(step):
            """Largest K <= max_chunk that does not skip a log/eval/save/
            snapshot/profile boundary (Every fires on exact multiples)."""
            gap = limit - step
            for p in periods:
                if p:
                    gap = min(gap, p - step % p)
            if profile:
                for b in (prof_start, prof_stop):
                    if step < b:
                        gap = min(gap, b - step)
            return max(1, min(max_chunk, gap))

        # resume dedupe: a snapshot saved exactly on an eval boundary would
        # re-fire eval() on every restart, appending duplicate eval.csv rows
        # for the same step (seen as 3x step-10000 rows in the r2 pipeline)
        last_eval_step = self.global_step
        while train_until(self.global_step):
            if profile and self.global_step == prof_start:
                jax.profiler.start_trace(str(self.work_dir / "profile"))
            if profile and self.global_step == prof_stop:
                jax.device_get(metrics)  # drain the dispatch queue first
                jax.profiler.stop_trace()
                print(f"profile trace written to {self.work_dir / 'profile'}")
            if (self.global_step > 0 and self.global_step != last_eval_step
                    and eval_every(self.global_step)):
                last_eval_step = self.global_step
                if cfg.get("eval_modality") == "task":
                    self.eval(use_imag=False)
                elif cfg.get("eval_modality") == "task_imag":
                    self.eval(use_imag=True)
            if self.global_step > 0 and visual_every(self.global_step):
                try:
                    self.report_visuals()
                except Exception as e:
                    print(f"report_visuals failed: {e}")
            n = chunk_len(self.global_step)
            with jax.profiler.StepTraceAnnotation("train", step_num=self.global_step):
                if cfg.get("train_from_data", True):
                    batch = None if self.device_replay is not None else next(self._replay_iter())
                    self.state, metrics = step_fn(self.state, batch, target,
                                                  self.global_step, n)
                else:
                    self.state, metrics = data_free_fn(self.state,
                                                       self.global_step, n)

            self.global_step += n
            if self.global_step > 0 and should_log(self.global_step):
                # one bulk device->host transfer for the whole metrics dict
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                if self.replay is not None:
                    host.update({k: float(v) for k, v in self.replay.stats.items()})
                self.logger.log_metrics(host, self.global_step, ty="train")
                elapsed, total = self.timer.reset()
                with self.logger.log_and_dump_ctx(self.global_step, ty="train") as log:
                    log("fps", int(cfg.log_every_frames) / max(elapsed, 1e-9))
                    log("step", self.global_step)
                    log("total_time", total)
            if should_save(self.global_step):
                self.save_last_model()
            if self.global_step == 1000 or (self.global_step % snapshot_every == 0):
                self.snap.save(
                    self.state,
                    {"step": self.global_step, "episode": self.global_episode},
                    name=f"snapshot_{self.global_step}")
        self.save_last_model()
        self.snap.wait_until_finished()
        # final-state eval: the in-loop trigger fires BEFORE a train step, so
        # the fully-trained policy (the headline number) would otherwise never
        # reach eval.csv — its last row would lag by up to eval_every_frames
        if (cfg.get("eval_modality") in ("task", "task_imag")
                and self.global_step != last_eval_step):
            self.eval(use_imag=cfg.get("eval_modality") == "task_imag")
        return metrics

    def save_last_model(self):
        self.snap.save(self.state, {"step": self.global_step, "episode": self.global_episode})


def main(argv=None):
    import os

    from genrl_tpu.configs import PRESETS, TRAIN_BASE
    from genrl_tpu.parallel import honor_platform_env
    from genrl_tpu.utils.config import compose

    honor_platform_env()

    if os.environ.get("GENRL_WATCHDOG"):
        # remote-TPU links can wedge a dispatch indefinitely; dump all thread
        # stacks periodically so a hung run is diagnosable from its log
        import faulthandler

        faulthandler.dump_traceback_later(
            int(os.environ["GENRL_WATCHDOG"]), repeat=True, exit=False)
    if os.environ.get("GENRL_DISTRIBUTED"):
        # multi-host: join this process into the global jax runtime BEFORE
        # any device access (coordinator/rank autodetected on TPU pods)
        from genrl_tpu.parallel import initialize_distributed

        initialize_distributed()
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(PRESETS, TRAIN_BASE, argv)
    ws = Workspace(cfg)
    ws.train()


if __name__ == "__main__":
    main()
