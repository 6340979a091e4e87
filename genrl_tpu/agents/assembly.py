"""Agent assembly: Dreamer / GenRL / Plan2Explore as jitted train steps.

Rebuild of the reference agent layer (agent/dreamer.py:19-117,
agent/genrl.py:27-124, agent/plan2explore.py:44-108). Architectural stance
(vs the reference's stateful torch modules with per-module Python update
calls): an agent here is a *static* bundle of flax module definitions plus a
single immutable `AgentState` pytree; every train step is one pure function
(state, batch, key) -> (state, metrics) that jits/pjits whole — world-model
gradient step, connector step, behavior imagination, reward computation and
optimizer updates fuse into one XLA program per step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genrl_tpu.agents.dreamer import (
    ACState,
    ActorCriticModules,
    WorldModel,
    behavior_update,
    _compute_dtype,
)
from genrl_tpu.models.connector import VideoSSM
from genrl_tpu.models.layers import NormedLinear
from genrl_tpu.models.rssm import dist_from_stats, swap_bt, unif_dist_from_stats
from genrl_tpu.rewards import plugins as R
from genrl_tpu.utils.optim import apply_updates_with_metrics, make_optimizer

sg = jax.lax.stop_gradient


def _pallas_gru_ok(cfg) -> bool:
    """Use the single-launch Pallas GRU rollout: TPU backend only (the CPU
    test mesh and the multichip dryrun run the XLA scan path; interpret-mode
    Pallas under an 8-device GSPMD mesh would be pure overhead)."""
    return bool(cfg.get("use_pallas", True)) and jax.default_backend() == "tpu"


@flax.struct.dataclass
class AgentState:
    """All learnable/accumulated state of an agent as one pytree."""

    wm_params: Any
    wm_opt: Any
    acting: ACState
    imag: Optional[ACState] = None
    connector_params: Any = None
    connector_opt: Any = None
    disag_params: Any = None
    disag_opt: Any = None
    step: jax.Array = flax.struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))


class Disagreement(nn.Module):
    """One-step forward-model ensemble for Plan2Explore
    (reference: Disagreement, agent/plan2explore.py:8-41). The reference loops
    over 5 nn.Sequential models; here the ensemble axis is vmapped so all
    members run as one batched matmul on the MXU."""

    pred_dim: int
    hidden: int
    n_models: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp: jax.Array) -> jax.Array:
        """inp [..., D] -> predictions [n_models, ..., pred_dim]."""

        class _Member(nn.Module):
            pred_dim: int
            hidden: int
            dtype: Any

            @nn.compact
            def __call__(self, x):
                x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32)(x)
                x = jax.nn.relu(x)
                return nn.Dense(self.pred_dim, dtype=self.dtype, param_dtype=jnp.float32)(x)

        ens = nn.vmap(
            _Member,
            in_axes=None,
            out_axes=0,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            axis_size=self.n_models,
        )(self.pred_dim, self.hidden, self.dtype, name="ensemble")
        return ens(inp)


# =====================================================================================
# Dreamer agent
# =====================================================================================


class DreamerAgent:
    """World model + acting behavior (reference: DreamerAgent, agent/dreamer.py:19-117)."""

    name = "dreamer"

    def __init__(self, cfg, obs_space: Dict[str, tuple], act_dim: int):
        self.cfg = cfg
        self.obs_space = dict(obs_space)
        self.act_dim = int(act_dim)
        dtype = _compute_dtype(cfg)
        self.dtype = dtype

        shapes = {k: tuple(v) for k, v in obs_space.items()}
        decoder_cfg = dict(cfg.decoder)
        decoder_cfg["image_dist"] = cfg.get("image_dist", "mse")
        self.wm = WorldModel(
            shapes=tuple(sorted(shapes.items())),
            action_dim=act_dim,
            rssm_cfg=tuple(sorted({**dict(cfg.rssm), "cell_input": "stoch",
                                   "use_pallas_gru": _pallas_gru_ok(cfg)}.items())),
            encoder_cfg=tuple(sorted(dict(cfg.encoder).items())),
            decoder_cfg=tuple(sorted(decoder_cfg.items())),
            reward_head_cfg=tuple(sorted(dict(cfg.reward_head).items())),
            discount_head_cfg=tuple(sorted(dict(cfg.discount_head).items())),
            pred_discount=bool(cfg.pred_discount),
            grad_heads=tuple(cfg.agent.grad_heads),
            loss_scales=tuple(sorted(dict(cfg.loss_scales).items())),
            kl_cfg=tuple(sorted(dict(cfg.kl).items())),
            clip_rewards=cfg.clip_rewards,
            decoder_inputs=cfg.decoder_inputs,
            discount=float(cfg.discount),
            dtype=dtype,
        )
        rssm = dict(cfg.rssm)
        self.feat_size = rssm["deter"] + rssm["stoch"] * max(1, rssm.get("discrete", 0) or 1)
        self.stoch_size = rssm["stoch"] * max(1, rssm.get("discrete", 0) or 1)
        self.deter_size = rssm["deter"]
        self.discrete = rssm.get("discrete", 0)
        acting_cfg = cfg.copy()
        acting_cfg.update_deep(dict(cfg.agent))
        self.agent_cfg = acting_cfg
        self.acting = ActorCriticModules(acting_cfg, act_dim, self.feat_size, name="")
        self.wm_tx = make_optimizer(**dict(cfg.model_opt))

    # ---- init -------------------------------------------------------------------
    def _dummy_batch(self, B: int = 1, T: int = 8) -> Dict[str, jnp.ndarray]:
        data = {}
        for k, shape in self.obs_space.items():
            dtype = jnp.uint8 if len(shape) == 3 else jnp.float32
            data[k] = jnp.zeros((B, T) + tuple(shape), dtype)
        data["action"] = jnp.zeros((B, T, self.act_dim), jnp.float32)
        data["reward"] = jnp.zeros((B, T, 1), jnp.float32)
        data["is_first"] = jnp.zeros((B, T), bool)
        data["is_terminal"] = jnp.zeros((B, T), bool)
        data["discount"] = jnp.ones((B, T, 1), jnp.float32)
        return data

    def init(self, key: jax.Array) -> AgentState:
        k_wm, k_loss, k_act, k_extra = jax.random.split(key, 4)
        data = self._dummy_batch()
        wm_params = self.wm.init(k_wm, data, k_loss, method="loss")
        state = AgentState(
            wm_params=wm_params,
            wm_opt=self.wm_tx.init(wm_params),
            acting=self.acting.init_state(k_act),
        )
        return self._init_extra(state, k_extra)

    def _init_extra(self, state: AgentState, key: jax.Array) -> AgentState:
        return state

    # ---- world model step ----------------------------------------------------------
    def wm_train_step(self, state: AgentState, data, key):
        """One gradient step on the world-model loss
        (reference: WorldModel.update, agent/dreamer.py:166-187)."""

        def loss_fn(params):
            loss, (last_state, outs, mets) = self.wm.apply(params, data, key, method="loss")
            return loss, (last_state, outs, mets)

        (loss, (last_state, outs, mets)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.wm_params
        )
        new_params, new_opt, opt_mets = apply_updates_with_metrics(
            self.wm_tx, grads, state.wm_opt, state.wm_params, "model"
        )
        metrics = dict(mets, model_loss=loss, **opt_mets)
        new_state = state.replace(wm_params=new_params, wm_opt=new_opt, step=state.step + 1)
        outs = dict(outs, is_terminal=data["is_terminal"])
        return new_state, outs, metrics

    def observe_data(self, state: AgentState, data, key):
        """No-grad posterior pass (reference: observe_data, agent/dreamer.py:210-217)."""
        outs, mets = self.wm.apply(state.wm_params, data, key, method="observe_data")
        outs = dict(outs, is_terminal=data["is_terminal"])
        return jax.tree_util.tree_map(sg, outs), mets

    # ---- behaviors -------------------------------------------------------------------
    def _acting_reward_fn(self, state: AgentState):
        name = self.agent_cfg.get("acting_reward_fn", "env_reward")
        spec = R.resolve_reward(name)  # loud failure on unknown names
        if spec.modality == "env":
            return R.env_reward_fn(
                lambda feat: self.wm.apply(state.wm_params, feat, method="reward_pred")
            )
        raise NotImplementedError(
            f"{name}: target-conditioned rewards drive the imag behavior "
            f"(agent.imag_reward_fn), not the acting one")

    def update_acting_behavior(self, state: AgentState, post, is_terminal, key,
                               reward_fn: Optional[Callable] = None):
        """(reference: update_acting_behavior, agent/dreamer.py:73-92)."""
        reward_fn = reward_fn or self._acting_reward_fn(state)
        new_ac, mets = behavior_update(
            self.acting, self.wm, state.wm_params, state.acting,
            post, is_terminal, reward_fn, key,
        )
        return state.replace(acting=new_ac), mets

    # ---- full step --------------------------------------------------------------------
    def train_step(self, state: AgentState, data, key):
        """WM + acting behavior, one jit (reference: collect_data-style
        DreamerAgent.update: wm update then acting behavior)."""
        k1, k2 = jax.random.split(key)
        state, outs, metrics = self.wm_train_step(state, data, k1)
        state, mets2 = self.update_acting_behavior(
            state, jax.tree_util.tree_map(sg, outs["post"]), outs["is_terminal"], k2
        )
        metrics.update(mets2)
        return state, metrics

    # ---- acting -----------------------------------------------------------------------
    def init_policy_carry(self, batch_size: int):
        zeros = lambda *s: jnp.zeros(s, jnp.float32)
        if self.discrete:
            latent = dict(
                logit=zeros(batch_size, self.cfg.rssm.stoch, self.discrete),
                stoch=zeros(batch_size, self.cfg.rssm.stoch, self.discrete),
                deter=zeros(batch_size, self.deter_size),
            )
        else:
            latent = dict(
                mean=zeros(batch_size, self.cfg.rssm.stoch),
                std=zeros(batch_size, self.cfg.rssm.stoch),
                stoch=zeros(batch_size, self.cfg.rssm.stoch),
                deter=zeros(batch_size, self.deter_size),
            )
        return latent, zeros(batch_size, self.act_dim)

    def policy_step(self, state: AgentState, obs, carry, key, eval_mode: bool = False):
        """One act() step (reference: DreamerAgent.act, agent/dreamer.py:41-64).
        carry = (latent_state, prev_action); obs values are [B, ...]."""
        latent, prev_action = carry
        k_obs, k_act = jax.random.split(key)
        post = self.wm.apply(
            state.wm_params, obs, latent, prev_action, k_obs,
            sample=not (eval_mode and self.cfg.get("eval_state_mean", False)),
            method="encode_obs_step",
        )
        feat = self.wm.apply(state.wm_params, post, method="get_feat")
        dist = self.acting.actor.apply(state.acting.actor_params, feat)
        action = dist.mode() if eval_mode else dist.sample(k_act)
        return action, (post, action)

    # ---- reporting ---------------------------------------------------------------------
    def report(self, state: AgentState, data, key):
        video = self.wm.apply(state.wm_params, data, key, method="video_pred")
        return {"openloop": video}


# =====================================================================================
# GenRL agent
# =====================================================================================


class GenRLAgent(DreamerAgent):
    """Dreamer + VideoSSM connector + imagination behavior trained with
    multimodal rewards (reference: GenRLAgent, agent/genrl.py:27-124)."""

    name = "genrl"

    def __init__(self, cfg, obs_space, act_dim, viclip_emb_dim: int = 512, n_frames: int = 8):
        super().__init__(cfg, obs_space, act_dim)
        self.viclip_emb_dim = viclip_emb_dim
        self.n_frames = n_frames
        conn_cfg = dict(cfg.agent.connector_rssm)
        conn_flags = dict(cfg.agent.connector)
        self.connector = VideoSSM(
            action_dim=viclip_emb_dim + n_frames,
            embed_dim=viclip_emb_dim,
            has_posterior=False,
            cell_input="stoch",
            n_frames=n_frames,
            temporal_embeds=bool(conn_flags.get("temporal_embeds", False)),
            detached_post=bool(conn_flags.get("detached_post", True)),
            token_dropout=float(conn_flags.get("token_dropout", 0.0)),
            loss_scale=float(conn_flags.get("loss_scale", 1.0)),
            rescale_embeds=bool(conn_flags.get("rescale_embeds", True)),
            clip_add_noise=float(cfg.agent.get("clip_add_noise", 0.0)),
            clip_lafite_noise=float(cfg.agent.get("clip_lafite_noise", 0.5)),
            denoising_ae=bool(conn_flags.get("denoising_ae", True)),
            learn_initial=bool(conn_cfg.pop("learn_initial", True)),
            connector_kl=tuple(sorted(dict(cfg.agent.connector_kl).items())),
            use_pallas_gru=_pallas_gru_ok(cfg),
            dtype=self.dtype,
            **{k: v for k, v in conn_cfg.items() if k != "learn_initial"},
        )
        self.connector_tx = make_optimizer(**dict(cfg.model_opt))
        imag_cfg = self.agent_cfg
        self.imag = ActorCriticModules(imag_cfg, act_dim, self.feat_size, name="imag")
        self._finetune = False

    def _init_extra(self, state: AgentState, key: jax.Array) -> AgentState:
        k_conn, k_roll, k_imag = jax.random.split(key, 3)
        B, T = 1, self.n_frames
        video_embed = jnp.zeros((B, T, self.viclip_emb_dim), jnp.float32)
        wm_post = {
            "stoch": jnp.zeros((B, T, self.cfg.rssm.stoch, max(1, self.discrete)), jnp.float32),
            "deter": jnp.zeros((B, T, self.deter_size), jnp.float32),
            "logit": jnp.zeros((B, T, self.cfg.rssm.stoch, max(1, self.discrete)), jnp.float32),
        }
        conn_params = self.connector.init(k_conn, video_embed, wm_post, k_roll, method="update")
        return state.replace(
            connector_params=conn_params,
            connector_opt=self.connector_tx.init(conn_params),
            imag=self.imag.init_state(k_imag),
        )

    # ---- connector ------------------------------------------------------------------
    def connector_train_step(self, state: AgentState, data, post, key):
        """Detached connector+aligner update (reference: connector_update_fn,
        agent/genrl.py:7-25; registered via add_module_to_update)."""
        video_embed = data["clip_video"].astype(jnp.float32)
        wm_post = {k: sg(v) for k, v in post.items()}

        def loss_fn(params):
            loss, mets = self.connector.apply(params, video_embed, wm_post, key, method="update")
            return loss, mets

        (loss, mets), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.connector_params)
        new_params, new_opt, opt_mets = apply_updates_with_metrics(
            self.connector_tx, grads, state.connector_opt, state.connector_params, "connector"
        )
        metrics = dict(mets, connector_loss=loss, **opt_mets)
        return state.replace(connector_params=new_params, connector_opt=new_opt), metrics

    # ---- unconditional target ----------------------------------------------------------
    def make_unconditional_target(
        self,
        state: AgentState,
        prompt_embed: jax.Array,
        batch: int,
        key: jax.Array,
        sample_for_target: bool = False,
        skip_first_target: bool = True,
    ) -> Dict[str, jax.Array]:
        """Generate the cached target latent trajectory from a prompt embed
        (reference: genrl_utils.py:289-321). Computed once per behavior phase,
        outside the per-step jit. Returns time-major [T_imag, B, ...]."""
        T_imag = int(self.agent_cfg.imag_horizon) + 1
        reps = T_imag + 1 if skip_first_target else T_imag
        B = 1 if not sample_for_target else batch
        embed = jnp.broadcast_to(prompt_embed.reshape(1, 1, -1), (B, reps, prompt_embed.shape[-1]))
        stats = self.connector.apply(
            state.connector_params, embed, key,
            sample=sample_for_target, reset_every_n_frames=False, denoise=True,
            method="video_imagine",
        )
        if skip_first_target:
            stats = {k: v[:, 1:] for k, v in stats.items()}
        stats = {k: swap_bt(v) for k, v in stats.items()}  # -> time-major
        if not sample_for_target and batch > 1:
            stats = {k: jnp.broadcast_to(v, (v.shape[0], batch) + v.shape[2:]) for k, v in stats.items()}
        return jax.tree_util.tree_map(sg, stats)

    def make_posterior_target(
        self,
        state: AgentState,
        demo: Dict[str, jax.Array],
        batch: int,
        key: jax.Array,
    ) -> Dict[str, jax.Array]:
        """Behavior target from a DEMONSTRATION window instead of the
        connector: encode the prompt video's own (observation, action) slice
        through the world model's posterior and use those latents as the
        target trajectory.

        This is an environment-gated variant of video_video_reward's target
        construction (reference: genrl_utils.py:372-409 builds the target via
        IV2 embed -> connector.video_imagine). The connector route's target
        fidelity is bounded by the CLIP checkpoint; with a random-init IV2
        (no downloadable weights here) connector targets decode to the
        dataset's dominant mode rather than the prompted behavior
        (evidence/diag_alignment/target_decoded.png). Posterior encoding of
        the same prompt video is exact by construction. Select with
        agent.imag_reward_args.target_from=posterior + a .npz demo window
        (scripts/make_video_prompt.py writes one beside the mp4).

        Returns time-major [T_demo, batch, ...] posterior stats.
        """
        data = {
            "observation": demo["observation"][None],  # [1, T, H, W, C]
            "action": demo["action"][None],
            "is_first": demo["is_first"][None],
            "is_terminal": jnp.zeros(demo["is_first"].shape, jnp.bool_)[None],
            "reward": jnp.zeros(demo["is_first"].shape + (1,), jnp.float32)[None],
        }
        outs, _ = self.wm.apply(state.wm_params, data, key, method="observe_data")
        keep = ("stoch", "deter", "logit") if self.discrete else ("stoch", "deter", "mean", "std")
        stats = {k: swap_bt(v) for k, v in outs["post"].items() if k in keep}  # [T, 1, ...]
        stats = {k: jnp.broadcast_to(v, (v.shape[0], batch) + v.shape[2:]) for k, v in stats.items()}
        return jax.tree_util.tree_map(sg, stats)

    # ---- imag behavior --------------------------------------------------------------------
    def _imag_reward_fn(self, state: AgentState, target_seq: Dict[str, jax.Array]):
        args = dict(self.agent_cfg.imag_reward_args)
        conv_in = lambda x: self.wm.apply(state.wm_params, x, method="conv_in_features")
        if args.get("score_from", "sample") == "mean":
            # score the EXPECTED stoch (softmax probs / gaussian mean) rather
            # than the per-step sample: imagined latents are resampled every
            # step, so sampled-feature temporal deltas are mostly categorical
            # sampling noise — measured on the toy treadmill world, delta
            # score fns fail to rank motion through that noise
            # (tests/test_env_return_transfer.py SWEEP). Expectation removes
            # the noise from the REWARD while dynamics stay sampled. Extra
            # knob vs the reference (which scores sampled latents,
            # tools/genrl_utils.py:344-366).
            if self.discrete:
                flatten_stoch = lambda s: jax.nn.softmax(
                    s["logit"].astype(jnp.float32)
                ).reshape(s["logit"].shape[:-2] + (-1,))
            else:
                flatten_stoch = lambda s: s["mean"]
        else:
            flatten_stoch = lambda s: (
                s["stoch"].reshape(s["stoch"].shape[:-2] + (-1,)) if self.discrete else s["stoch"]
            )
        get_dist = lambda s: dist_from_stats(s, self.discrete)
        return R.make_aligned_reward_fn(
            target_seq,
            score_fn=args.get("score_fn", "max_cosine"),
            n_frames=self.n_frames,
            conv_in_fn=conv_in,
            get_stoch_agent=flatten_stoch,
            get_stoch_target=flatten_stoch,
            get_dist_agent=get_dist,
            get_dist_target=get_dist,
            align_initial=bool(args.get("align_initial", False)),
            align_sequence=bool(args.get("align_sequence", True)),
            weighted_align=bool(args.get("weighted_align", False)),
            weighted_align_compat=bool(args.get("weighted_align_compat", False)),
            score_clip=(None if args.get("score_clip") is None
                        else float(args["score_clip"])),
            keep_stats_grad=args.get("score_from", "sample") == "mean",
        )

    def update_imag_behavior(self, state: AgentState, post, is_terminal, target_seq, key):
        """(reference: update_imag_behavior, agent/genrl.py:108-124)."""
        reward_fn = self._imag_reward_fn(state, target_seq)
        new_imag, mets = behavior_update(
            self.imag, self.wm, state.wm_params, state.imag,
            post, is_terminal, reward_fn, key,
        )
        return state.replace(imag=new_imag), mets

    def report_text2video(self, state: AgentState, clip, task: str, key,
                          duration: Optional[int] = None):
        """Decode imagined videos for every domain predicate
        (reference: report_text2video, tools/genrl_utils.py:202-238).
        `clip` is a ViCLIP handle; returns {f'text2video/<prompt>': video}."""
        from genrl_tpu.rewards.plugins import DOMAIN2PREDICATES

        domain = task.split("_", 1)[0]
        predicates = DOMAIN2PREDICATES.get(domain, [])
        T = duration or self.n_frames * 2
        out = {}
        for prompt in predicates:
            key, k = jax.random.split(key)
            embed = jnp.asarray(clip.get_txt_feat(prompt)).reshape(1, 1, -1)
            video_embed = jnp.broadcast_to(embed, (1, T, embed.shape[-1]))
            prior = self.connector.apply(
                state.connector_params, video_embed, k, sample=False,
                reset_every_n_frames=False, denoise=True, method="video_imagine")
            inp = self.wm.apply(state.wm_params, prior, method="decoder_input")
            video = self.wm.apply(state.wm_params, inp, method="decode")[
                "observation"].mean + 0.5
            out[f"text2video/{prompt}"] = jnp.clip(video, 0, 1)
        return out

    # ---- combined steps ----------------------------------------------------------------------
    def train_step(self, state: AgentState, data, key, target_seq=None,
                   train_world_model=True, train_connector=True,
                   imag_env_reward=False):
        """One full GenRL model-learning step (train.py:273-280 orchestration),
        a single jitted program. `imag_env_reward=True` trains the imag
        behavior with the reward head instead of a prompt target (reference:
        `agent.imag_reward_fn=env_reward` resolves through the same
        update_imag_behavior path, agent/genrl.py:108-124)."""
        k1, k2, k3 = jax.random.split(key, 3)
        metrics = {}
        # named scopes label the phases in jax.profiler traces / HLO
        # (SURVEY.md §5.1 rebuild plan)
        if train_world_model:
            with jax.named_scope("wm_update"):
                state, outs, metrics = self.wm_train_step(state, data, k1)
        else:
            with jax.named_scope("wm_observe"):
                outs, metrics = self.observe_data(state, data, k1)
        if train_connector and not self._finetune:
            with jax.named_scope("connector_update"):
                state, mets = self.connector_train_step(state, data, outs["post"], k2)
            metrics.update(mets)
        if target_seq is not None or imag_env_reward:
            with jax.named_scope("behavior_update"):
                post = jax.tree_util.tree_map(sg, outs["post"])
                if imag_env_reward:
                    new_imag, mets = behavior_update(
                        self.imag, self.wm, state.wm_params, state.imag,
                        post, outs["is_terminal"],
                        self._acting_reward_fn(state), k3)
                    state = state.replace(imag=new_imag)
                else:
                    state, mets = self.update_imag_behavior(
                        state, post, outs["is_terminal"], target_seq, k3)
            metrics.update(mets)
        elif self._finetune:
            # finetune phase (reference: finetune_mode + train loop,
            # agent/genrl.py:55-59 + conf/train_mode/finetune.yaml): the imag
            # behavior IS the acting behavior now, trained in imagination
            # with the env reward from the (now-learned) reward head
            with jax.named_scope("finetune_behavior"):
                reward_fn = self._acting_reward_fn(state)
                new_imag, mets = behavior_update(
                    self.imag, self.wm, state.wm_params, state.imag,
                    jax.tree_util.tree_map(sg, outs["post"]),
                    outs["is_terminal"], reward_fn, k3)
                state = state.replace(imag=new_imag)
            metrics.update(mets)
        return state, metrics

    # ---- data-free start synthesis --------------------------------------------------------------
    def synthesize_starts(self, state: AgentState, key, batch_size: int, batch_length: int,
                          start_from_video="mix", mix_random_actions=True, imag_warmup_steps=5):
        """Data-free RL start states (reference: train.py:281-338): uniform
        stoch inits, optionally mixed with connector rollouts from random
        normalized embeds, then a short warmup imagination."""
        keys = jax.random.split(key, 8)
        N = batch_size * batch_length
        half = N // 2 if mix_random_actions else N
        init = self.wm.apply(state.wm_params, half if mix_random_actions else N,
                             method=lambda wm, b: wm.rssm.initial(b))
        unif = unif_dist_from_stats(init, self.discrete)
        if self.discrete:
            init["logit"] = jnp.log(unif.probs)
        else:
            init["mean"] = jnp.zeros_like(init["mean"])
            init["std"] = jnp.ones_like(init["std"])
        init["stoch"] = unif.sample(keys[0])

        if start_from_video in (True, "mix"):
            T = self.n_frames * 2
            B = init["deter"].shape[0] // T
            emb = jax.random.normal(keys[1], (B, T, self.viclip_emb_dim))
            emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
            video_init = self.connector.apply(
                state.connector_params, emb, keys[2], sample=True,
                reset_every_n_frames=False, denoise=True, method="video_imagine")
            video_stoch = video_init["stoch"].reshape((B * T,) + video_init["stoch"].shape[2:])
            if start_from_video == "mix":
                probs = jax.random.uniform(keys[3], (B * T,) + (1,) * (init["stoch"].ndim - 1)) > 0.5
                init["stoch"] = jnp.where(probs, init["stoch"][: B * T], video_stoch)
            else:
                init["stoch"] = video_stoch

        if mix_random_actions:
            fake_action = jax.random.uniform(keys[4], (half, imag_warmup_steps, self.act_dim)) * 2 - 1
            post1 = self.wm.apply(
                state.wm_params, fake_action, keys[5], init,
                method=lambda wm, a, k, s: wm.rssm.imagine(a, k, s))
            post1 = {k: v[:, -1] for k, v in post1.items()}
            policy = lambda feat: self.imag.actor.apply(state.imag.actor_params, feat)
            init2 = {k: v.reshape((batch_size, batch_length // 2) + v.shape[1:]) for k, v in init.items()}
            seq2 = self.wm.apply(state.wm_params, policy, init2, None, imag_warmup_steps, keys[6],
                                 method="imagine")
            post2 = {k: seq2[k][-1] for k in post1}
            post = {k: jnp.concatenate([post1[k], post2[k]], 0) for k in post1}
        else:
            policy = lambda feat: self.imag.actor.apply(state.imag.actor_params, feat)
            init2 = {k: v.reshape((batch_size, batch_length) + v.shape[1:]) for k, v in init.items()}
            seq = self.wm.apply(state.wm_params, policy, init2, None, imag_warmup_steps, keys[6],
                                method="imagine")
            post = {k: seq[k][-1] for k in ("logit", "stoch", "deter") if k in seq}

        post = {k: v.reshape((batch_size, batch_length) + v.shape[1:]) for k, v in post.items()}
        is_terminal = jnp.zeros((batch_size, batch_length))
        return jax.tree_util.tree_map(sg, post), is_terminal

    def train_step_data_free(self, state: AgentState, key, target_seq,
                             batch_size: int, batch_length: int,
                             start_from_video="mix", mix_random_actions=True,
                             imag_warmup_steps=5):
        """Fully data-free behavior learning step (train.py:281-338)."""
        k1, k2 = jax.random.split(key)
        post, is_terminal = self.synthesize_starts(
            state, k1, batch_size, batch_length, start_from_video,
            mix_random_actions, imag_warmup_steps)
        state, metrics = self.update_imag_behavior(state, post, is_terminal, target_seq, k2)
        return state, metrics

    def finetune_mode(self):
        """Finetuning phase (reference: finetune_mode, agent/genrl.py:55-59):
        the imag behavior becomes the acting behavior (policy_step defaults to
        use_imag=True already), connector updates stop, and the reward head
        joins the gradient heads."""
        if "reward" not in tuple(self.wm.grad_heads):
            self.wm = self.wm.clone(grad_heads=tuple(self.wm.grad_heads) + ("reward",))
        self._finetune = True

    # ---- reporting --------------------------------------------------------------
    def report(self, state: AgentState, data, key, nvid: int = 8,
               obs_key: str = "observation"):
        """Open-loop WM prediction + connector video prediction panels
        (reference: GenRLAgent.report, agent/genrl.py:64-106). data must
        contain clip_video; returns dict of [B, T, H, W*3, C] videos."""
        key, k_super, k1, k2 = jax.random.split(key, 4)
        report = super().report(state, data, k_super)
        n = self.n_frames
        wm_apply = lambda *a, **kw: self.wm.apply(state.wm_params, *a, **kw)

        data_p = wm_apply(dict(data), method="preprocess")
        truth = data_p[obs_key][:nvid].astype(jnp.float32) + 0.5
        embed = wm_apply(data_p, method="encode")
        post, _ = wm_apply(embed[:nvid, :n], data_p["action"][:nvid, :n],
                           data_p["is_first"][:nvid, :n], k1, method="observe_rssm")
        recon = wm_apply(wm_apply(post, method="decoder_input"),
                         method="decode")[obs_key].mean
        dreamer_init = {k: v[:, -1] for k, v in post.items()}

        B, T = data["clip_video"][:nvid].shape[:2]
        video_embed = data["clip_video"][:nvid, 2 * n - 1 :: n]
        chunks = video_embed.shape[1]
        video_embed = jnp.repeat(video_embed[:, :, None], n, axis=2)
        video_embed = video_embed.reshape(B, chunks * n, -1)
        prior = self.connector.apply(state.connector_params, video_embed, k2,
                                     dreamer_init=dreamer_init,
                                     reset_every_n_frames=False,
                                     method="video_imagine")
        prior_recon = wm_apply(wm_apply(prior, method="decoder_input"),
                               method="decode")[obs_key].mean
        model = jnp.clip(jnp.concatenate(
            [recon + 0.5, prior_recon + 0.5], 1), 0, 1)
        Tm = model.shape[1]
        error = (model - truth[:, :Tm] + 1) / 2
        report["video_clip_pred"] = jnp.concatenate([truth[:, :Tm], model, error], 3)
        return report

    def policy_step(self, state: AgentState, obs, carry, key, eval_mode: bool = False,
                    use_imag: bool = True):
        latent, prev_action = carry
        k_obs, k_act = jax.random.split(key)
        post = self.wm.apply(
            state.wm_params, obs, latent, prev_action, k_obs,
            sample=not (eval_mode and self.cfg.get("eval_state_mean", False)),
            method="encode_obs_step",
        )
        feat = self.wm.apply(state.wm_params, post, method="get_feat")
        ac = self.imag if (use_imag and state.imag is not None) else self.acting
        ac_state = state.imag if (use_imag and state.imag is not None) else state.acting
        dist = ac.actor.apply(ac_state.actor_params, feat)
        action = dist.mode() if eval_mode else dist.sample(k_act)
        return action, (post, action)


# =====================================================================================
# Plan2Explore
# =====================================================================================


class Plan2Explore(DreamerAgent):
    """Ensemble-disagreement exploration (reference: agent/plan2explore.py:44-108)."""

    name = "plan2explore"

    def __init__(self, cfg, obs_space, act_dim):
        super().__init__(cfg, obs_space, act_dim)
        from genrl_tpu.models.encoder import encoder_embed_dim

        shapes = {k: tuple(v) for k, v in obs_space.items()}
        enc = dict(cfg.encoder)
        self.embed_dim = encoder_embed_dim(
            shapes, enc.get("cnn_keys", ".*"), enc.get("mlp_keys", ".*"),
            enc.get("cnn_depth", 48), tuple(enc.get("cnn_kernels", (4, 4, 4, 4))),
            tuple(enc.get("mlp_layers", (400, 400, 400, 400))))
        self.disagreement = Disagreement(
            pred_dim=self.embed_dim, hidden=self.embed_dim,
            n_models=int(cfg.agent.get("disag_models", 5)), dtype=self.dtype)
        self.disag_tx = make_optimizer(**dict(cfg.model_opt))
        self.reward_free = True

    def _init_extra(self, state: AgentState, key: jax.Array) -> AgentState:
        inp = jnp.zeros((1, self.feat_size + self.act_dim))
        params = self.disagreement.init(key, inp)
        return state.replace(disag_params=params, disag_opt=self.disag_tx.init(params))

    def _intr_reward_fn(self, state: AgentState):
        """Ensemble variance intrinsic reward (reference: compute_intr_reward,
        agent/plan2explore.py:73-84)."""

        def fn(seq, key=None):
            del key
            obs = seq["feat"][:-1]
            action = sg(seq["action"][1:])
            preds = self.disagreement.apply(
                state.disag_params, jnp.concatenate([obs, action], -1))
            disag = jnp.var(preds.astype(jnp.float32), axis=0).mean(-1)
            if self.agent_cfg.get("disag_log", False):
                disag = jnp.log(disag)
            reward = jnp.zeros(seq["action"].shape[:-1] + (1,), jnp.float32)
            return reward.at[1:].set(disag[..., None])

        return fn

    def train_step(self, state: AgentState, data, key):
        """WM update + disagreement training + intrinsic-reward acting update
        (reference: Plan2Explore.update, agent/plan2explore.py:86-108)."""
        k1, k2, k3 = jax.random.split(key, 3)
        state, outs, metrics = self.wm_train_step(state, data, k1)
        start = jax.tree_util.tree_map(sg, outs["post"])
        if self.reward_free:
            B, T = data["action"].shape[:2]
            inp = sg(outs["feat"][:, :-1]).reshape(B * (T - 1), -1)
            action = data["action"][:, 1:].reshape(B * (T - 1), -1)
            target = sg(outs["embed"][:, 1:]).reshape(B * (T - 1), -1)

            def disag_loss_fn(params):
                preds = self.disagreement.apply(params, jnp.concatenate([inp, action], -1))
                err = jnp.linalg.norm(target[None].astype(jnp.float32) - preds.astype(jnp.float32),
                                      axis=-1)
                return jnp.mean(err)

            loss, grads = jax.value_and_grad(disag_loss_fn)(state.disag_params)
            new_params, new_opt, opt_mets = apply_updates_with_metrics(
                self.disag_tx, grads, state.disag_opt, state.disag_params, "disagreement")
            state = state.replace(disag_params=new_params, disag_opt=new_opt)
            metrics.update(opt_mets, disagreement_loss=loss)
            reward_fn = self._intr_reward_fn(state)
        else:
            reward_fn = self._acting_reward_fn(state)
        state, mets = self.update_acting_behavior(state, start, outs["is_terminal"], k3, reward_fn)
        metrics.update(mets)
        return state, metrics


# =====================================================================================
# factory
# =====================================================================================


def make_agent(cfg, obs_space: Dict[str, tuple], act_dim: int):
    name = cfg.agent.name
    if name == "genrl":
        return GenRLAgent(cfg, obs_space, act_dim,
                          viclip_emb_dim=int(cfg.get("viclip_emb_dim", 512)),
                          n_frames=int(cfg.get("n_frames", 8)))
    if name == "dreamer":
        return DreamerAgent(cfg, obs_space, act_dim)
    if name == "plan2explore":
        return Plan2Explore(cfg, obs_space, act_dim)
    raise NotImplementedError(name)
