"""DreamerV3-style agent: world model + actor-critic imagination learning.

TPU-native rebuild of the reference DreamerAgent/WorldModel/ActorCritic
(agent/dreamer.py:19-462). Key design differences from the reference:

* Every update is ONE jitted function: preprocess -> encoder -> RSSM scan ->
  heads -> losses -> optimizer, plus the imagination rollout + actor/critic
  losses — no Python loops, no AMP grad scaler (bf16 compute / f32 params).
* All state (params, optimizer moments, slow-target params, reward
  normalizers, EMA values) lives in immutable train-state pytrees, so steps
  compose with pjit over a device mesh and checkpoint as plain pytrees.
* Reward plugins resolve through an explicit registry
  (genrl_tpu/rewards/__init__.py) instead of `globals()` string dispatch
  (reference: agent/dreamer.py:88).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genrl_tpu.models.decoder import Decoder
from genrl_tpu.models.encoder import Encoder, encoder_embed_dim
from genrl_tpu.models.layers import MLPHead
from genrl_tpu.models.rssm import RSSM, State, swap_bt
from genrl_tpu.ops import dists as D
from genrl_tpu.ops.math import lambda_return
from genrl_tpu.ops.streamnorm import StreamNormState, reward_ema, stream_norm, stream_norm_init
from genrl_tpu.utils.optim import apply_updates_with_metrics, make_optimizer

sg = jax.lax.stop_gradient


def _compute_dtype(cfg) -> Any:
    return jnp.bfloat16 if int(cfg.precision) == 16 else jnp.float32


# =============================================================================
# World model
# =============================================================================


class WorldModel(nn.Module):
    """Encoder + RSSM + heads {decoder, reward[, discount]}
    (reference: WorldModel, agent/dreamer.py:120-321)."""

    shapes: Any                 # dict key -> shape; images NHWC
    action_dim: int
    rssm_cfg: Any
    encoder_cfg: Any
    decoder_cfg: Any
    reward_head_cfg: Any
    discount_head_cfg: Any
    pred_discount: bool
    grad_heads: Tuple[str, ...]
    loss_scales: Any
    kl_cfg: Any
    clip_rewards: str = "identity"
    decoder_inputs: str = "stoch"
    discount: float = 0.99
    dtype: Any = jnp.float32

    def setup(self):
        shapes = dict(self.shapes)
        enc = dict(self.encoder_cfg)
        self.encoder = Encoder(shapes=tuple(sorted(shapes.items())), dtype=self.dtype, name="encoder", **enc)
        embed_dim = encoder_embed_dim(
            shapes, enc.get("cnn_keys", r".*"), enc.get("mlp_keys", r".*"),
            enc.get("cnn_depth", 48), tuple(enc.get("cnn_kernels", (4, 4, 4, 4))),
            tuple(enc.get("mlp_layers", (400, 400, 400, 400))),
        )
        self.embed_dim = embed_dim
        self.rssm = RSSM(
            action_dim=self.action_dim, embed_dim=embed_dim, dtype=self.dtype, name="rssm",
            **dict(self.rssm_cfg),
        )
        self.heads_decoder = Decoder(
            shapes=tuple(sorted(shapes.items())), dtype=self.dtype, name="decoder",
            image_dist=dict(self.decoder_cfg).pop("image_dist", "mse"),
            **{k: v for k, v in dict(self.decoder_cfg).items() if k != "image_dist"},
        )
        self.heads_reward = MLPHead(shape=(1,), dtype=self.dtype, outscale=0.0, name="reward",
                                    **dict(self.reward_head_cfg))
        if self.pred_discount:
            self.heads_discount = MLPHead(shape=(1,), dtype=self.dtype, name="discount",
                                          **dict(self.discount_head_cfg))

    # ---- helpers -------------------------------------------------------------
    def get_feat(self, state: State) -> jax.Array:
        return self.rssm.get_feat(state)

    def decoder_input(self, state: State) -> jax.Array:
        return {"stoch": self.rssm.get_stoch, "feat": self.rssm.get_feat,
                "deter": self.rssm.get_deter}[self.decoder_inputs](state)

    def decoder_input_size(self) -> int:
        return {"stoch": self.rssm.get_stoch_size, "feat": self.rssm.get_feat_size,
                "deter": self.rssm.get_deter_size}[self.decoder_inputs]()

    def inp_size(self) -> int:
        return self.rssm.get_feat_size()

    def reward_pred(self, feat: jax.Array):
        return self.heads_reward(feat)

    def conv_in_features(self, x: jax.Array) -> jax.Array:
        """Decoder's first linear projection — GenRL's latent reward space
        (reference: tools/genrl_utils.py:253-259)."""
        return self.heads_decoder.conv_in_features(x)

    def preprocess(self, obs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """uint8 -> [-0.5, 0.5], reward clipping, discount from is_terminal
        (reference: WorldModel.preprocess, agent/dreamer.py:289-305)."""
        out = {}
        for key, value in obs.items():
            if key.startswith("log_"):
                out[key] = value
                continue
            if value.dtype == jnp.uint8:
                value = value.astype(self.dtype) / 255.0 - 0.5
            out[key] = value
        reward_fn = {
            "identity": lambda x: x,
            "sign": jnp.sign,
            "tanh": jnp.tanh,
        }[self.clip_rewards]
        if "reward" in out:
            reward = reward_fn(out["reward"].astype(jnp.float32))
            # canonicalize to a trailing event dim [..., 1] (twohot heads
            # expect it; is_first is always event-free [B, T])
            if "is_first" in out and reward.ndim == out["is_first"].ndim:
                reward = reward[..., None]
            out["reward"] = reward
        if "is_terminal" in out:
            discount = 1.0 - out["is_terminal"].astype(jnp.float32)
            if "reward" in out and discount.ndim < out["reward"].ndim:
                discount = discount[..., None]
            out["discount"] = discount
        return out

    # ---- losses ---------------------------------------------------------------
    def loss(self, data: Dict[str, jax.Array], key: jax.Array, state: Optional[State] = None):
        """Joint KL + likelihood loss (reference: WorldModel.loss, agent/dreamer.py:219-252)."""
        data = self.preprocess(data)
        embed = self.encoder(data)
        post, prior = self.rssm.observe(embed, data["action"], data["is_first"], key, state)
        kl_loss, kl_value = self.rssm.kl_loss(post, prior, **dict(self.kl_cfg))
        losses = {"kl": kl_loss}
        feat = self.get_feat(post)
        dec_inp = self.decoder_input(post)
        heads = {"decoder": (self.heads_decoder, dec_inp), "reward": (self.heads_reward, feat)}
        if self.pred_discount:
            heads["discount"] = (self.heads_discount, feat)
        likes = {}
        for name, (head, inp) in heads.items():
            inp = inp if name in tuple(self.grad_heads) else sg(inp)
            out = head(inp)
            dists = out if isinstance(out, dict) else {name: out}
            for k, dist in dists.items():
                like = dist.log_prob(data[k])
                likes[k] = like
                losses[k] = -jnp.mean(like)
        scales = dict(self.loss_scales)
        model_loss = sum(scales.get(k, 1.0) * v for k, v in losses.items())
        outs = dict(embed=embed, feat=feat, post=post, prior=prior, kl=kl_value)
        metrics = {f"{k}_loss": v for k, v in losses.items()}
        metrics["model_kl"] = jnp.mean(kl_value)
        metrics["prior_ent"] = jnp.mean(self.rssm.get_dist(prior).entropy())
        metrics["post_ent"] = jnp.mean(self.rssm.get_dist(post).entropy())
        last_state = {k: v[:, -1] for k, v in post.items()}
        return model_loss, (last_state, outs, metrics)

    def observe_data(self, data: Dict[str, jax.Array], key: jax.Array, state: Optional[State] = None):
        """No-grad posterior pass (reference: observe_data, agent/dreamer.py:210-217)."""
        data = self.preprocess(data)
        embed = self.encoder(data)
        post, prior = self.rssm.observe(embed, data["action"], data["is_first"], key, state)
        _, kl_value = self.rssm.kl_loss(post, prior, **dict(self.kl_cfg))
        outs = dict(embed=embed, post=post, prior=prior, is_terminal=data["is_terminal"])
        return outs, {"model_kl": jnp.mean(kl_value)}

    # ---- imagination ------------------------------------------------------------
    def imagine(
        self,
        policy_fn: Callable[[jax.Array], Any],
        start: State,
        is_terminal: Optional[jax.Array],
        horizon: int,
        key: jax.Array,
        task_cond: Optional[jax.Array] = None,
        eval_policy: bool = False,
    ) -> Dict[str, jax.Array]:
        """Latent policy rollout -> time-major seq [H+1, B, ...]
        (reference: WorldModel.imagine, agent/dreamer.py:254-287)."""
        flatten = lambda x: x.reshape((-1,) + x.shape[2:])
        start = {k: flatten(v) if v.ndim > 2 else v.reshape(-1, v.shape[-1]) for k, v in start.items()}
        B = start["deter"].shape[0]
        feat0 = self.get_feat(start)
        inp0 = feat0 if task_cond is None else jnp.concatenate([feat0, task_cond], -1)
        key, k0 = jax.random.split(key)
        dist0 = policy_fn(inp0)
        action0 = jnp.zeros_like(dist0.sample(k0))

        keys = jax.random.split(key, horizon)

        def step(mod, carry, k):
            state, feat = carry
            k_pol, k_img = jax.random.split(k)
            inp = feat if task_cond is None else jnp.concatenate([feat, task_cond], -1)
            dist = policy_fn(sg(inp))
            action = dist.mean if eval_policy else dist.sample(k_pol)
            nstate = mod.rssm.img_step(state, action, k_img)
            nfeat = mod.rssm.get_feat(nstate)
            return (nstate, nfeat), {**nstate, "action": action, "feat": nfeat}

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False},
                       in_axes=0, out_axes=0)
        _, outs = scan(self, (start, feat0), keys)
        seq = {k: jnp.concatenate([start[k][None] if k in start else None, v], 0)
               if k in start else v for k, v in outs.items()}
        seq["action"] = jnp.concatenate([action0[None], outs["action"]], 0)
        seq["feat"] = jnp.concatenate([feat0[None], outs["feat"]], 0)
        if task_cond is not None:
            seq["task"] = jnp.repeat(task_cond[None], horizon + 1, 0)

        if self.pred_discount:
            disc = self.heads_discount(seq["feat"]).mean
            if is_terminal is not None:
                true_first = 1.0 - flatten(is_terminal).astype(jnp.float32)
                true_first = true_first.reshape((1, B, 1))
                disc = jnp.concatenate([true_first, disc[1:]], 0)
        else:
            disc = jnp.ones(seq["feat"].shape[:-1] + (1,), jnp.float32)
        seq["discount"] = disc * self.discount
        seq["weight"] = jnp.cumprod(jnp.concatenate([jnp.ones_like(disc[:1]), disc[:-1]], 0), 0)
        return seq

    # ---- thin apply-method surface (for jitted report/eval paths) -----------------
    def encode(self, data):
        return self.encoder(data)

    def observe_rssm(self, embed, action, is_first, key, state=None):
        return self.rssm.observe(embed, action, is_first, key, state)

    def decode(self, x):
        return self.heads_decoder(x)

    # ---- acting ------------------------------------------------------------------
    def encode_obs_step(
        self,
        obs: Dict[str, jax.Array],
        prev_state: Optional[State],
        prev_action: jax.Array,
        key: jax.Array,
        sample: bool = True,
    ) -> State:
        """One policy-side filtering step: preprocess -> encoder -> rssm.obs_step
        (reference: DreamerAgent.act, agent/dreamer.py:41-64)."""
        data = self.preprocess(dict(obs))
        embed = self.encoder(data)
        if prev_state is None:
            prev_state = self.rssm.initial(prev_action.shape[0])
        post, _ = self.rssm.obs_step(prev_state, prev_action, embed, data["is_first"], key, sample)
        return post

    # ---- reporting ---------------------------------------------------------------
    def video_pred(self, data: Dict[str, jax.Array], key: jax.Array, obs_key: str = "observation",
                   nvid: int = 8, context: int = 5):
        """Open-loop video prediction panel (reference: video_pred, agent/dreamer.py:307-321).
        Returns [B, T, H, W*3, C] in [0, 1]: truth | model | error."""
        k1, k2 = jax.random.split(key)
        data = self.preprocess(data)
        truth = data[obs_key][:nvid] + 0.5
        embed = self.encoder(data)
        states, _ = self.rssm.observe(
            embed[:nvid, :context], data["action"][:nvid, :context],
            data["is_first"][:nvid, :context], k1)
        recon = self.heads_decoder(self.decoder_input(states))[obs_key].mean
        init = {k: v[:, -1] for k, v in states.items()}
        prior = self.rssm.imagine(data["action"][:nvid, context:], k2, init)
        prior_recon = self.heads_decoder(self.decoder_input(prior))[obs_key].mean
        model = jnp.clip(jnp.concatenate([recon[:, :context] + 0.5, prior_recon + 0.5], 1), 0, 1)
        error = (model - truth + 1) / 2
        return jnp.concatenate([truth, model, error], 3)


# =============================================================================
# Actor-critic
# =============================================================================


class ActorCriticModules:
    """Actor/critic module pair (reference: ActorCritic, agent/dreamer.py:323-462)."""

    def __init__(self, cfg, act_dim: int, feat_size: int, name: str = ""):
        self.cfg = cfg
        self.name = name
        dtype = _compute_dtype(cfg)
        actor_cfg = dict(cfg.actor)
        if cfg.get("discrete_actions", False):
            actor_cfg["dist"] = "onehot"
        self.actor = MLPHead(shape=(act_dim,), dtype=dtype, **actor_cfg)
        self.critic = MLPHead(shape=(1,), dtype=dtype, outscale=0.0, **dict(cfg.critic))
        self.actor_grad = cfg.get(f"{name}_actor_grad".strip("_"), cfg.get("actor_grad", "dynamics"))
        self.actor_tx = make_optimizer(**dict(cfg.actor_opt))
        self.critic_tx = make_optimizer(**dict(cfg.critic_opt))
        self.feat_size = feat_size
        self.act_dim = act_dim
        if name == "imag":
            self.reward_norm_cfg = dict(cfg.get("imag_reward_norm", cfg.reward_norm))
        elif cfg.get("reward_ema", False):
            self.reward_norm_cfg = dict(momentum=1.0, scale=1.0, eps=1e-8)
        else:
            self.reward_norm_cfg = dict(cfg.reward_norm)

    def init_state(self, key) -> "ACState":
        k1, k2 = jax.random.split(key)
        feat = jnp.zeros((1, self.feat_size))
        actor_params = self.actor.init(k1, feat)
        critic_params = self.critic.init(k2, feat)
        return ACState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=jax.tree_util.tree_map(jnp.copy, critic_params),
            actor_opt=self.actor_tx.init(actor_params),
            critic_opt=self.critic_tx.init(critic_params),
            updates=jnp.zeros((), jnp.int32),
            ema_vals=jnp.zeros((2,), jnp.float32),
            rewnorm=stream_norm_init(),
        )


@flax.struct.dataclass
class ACState:
    actor_params: Any
    critic_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    updates: jax.Array
    ema_vals: jax.Array
    rewnorm: StreamNormState


@flax.struct.dataclass
class WMState:
    params: Any
    opt: Any
    step: jax.Array


def behavior_update(
    ac: ActorCriticModules,
    wm: WorldModel,
    wm_params,
    ac_state: ACState,
    start: State,
    is_terminal: Optional[jax.Array],
    reward_fn: Callable[[Dict[str, jax.Array], jax.Array], jax.Array],
    key: jax.Array,
) -> Tuple[ACState, Dict[str, jax.Array]]:
    """One actor-critic update on imagined rollouts
    (reference: ActorCritic.update, agent/dreamer.py:366-390). `reward_fn`
    maps (seq, key) -> reward; gradients flow through the rollout into the
    actor (dynamics backprop) unless actor_grad == 'reinforce'."""
    cfg = ac.cfg
    hor = int(cfg.imag_horizon)
    start = {k: sg(v) for k, v in start.items()}
    key, key_img, key_rew, key_ent = jax.random.split(key, 4)
    metrics = {}

    def rollout(actor_params):
        policy = lambda feat: ac.actor.apply(actor_params, feat)
        seq = wm.apply(wm_params, policy, start, is_terminal, hor, key_img, method="imagine")
        reward = reward_fn(seq, key_rew)
        if reward.ndim == 2:
            reward = reward[..., None]
        return seq, reward

    def actor_loss_fn(actor_params):
        seq, raw_reward = rollout(actor_params)
        reward, rewnorm_state, mets1 = stream_norm(ac_state.rewnorm, raw_reward, **ac.reward_norm_cfg)
        seq = dict(seq, reward=reward)
        # lambda-return targets from the slow critic (reference: target(), :440-453)
        value = ac.critic.apply(ac_state.target_critic_params, seq["feat"]).mean
        target = lambda_return(
            reward[:-1].astype(jnp.float32), value[:-1], seq["discount"][:-1],
            bootstrap=value[-1], lambda_=float(cfg.discount_lambda))
        baseline = value[:-1]
        mets = {f"reward_{k}": v for k, v in mets1.items()}
        mets["critic_slow"] = jnp.mean(value)
        mets["critic_target"] = jnp.mean(target)

        policy = ac.actor.apply(actor_params, sg(seq["feat"][:-2]))
        # reward_ema normalizes λ-targets for EVERY behavior, including the
        # imag one (reference agent/dreamer.py:400-410 — the imag behavior
        # only swaps its StreamNorm, agent/genrl.py:53, not the target EMA)
        if cfg.get("reward_ema", False):
            offset, scale, new_ema = reward_ema(target, ac_state.ema_vals)
            normed_target = (target - offset) / scale
            normed_baseline = (baseline - offset) / scale
            mets["normed_target_mean"] = jnp.mean(normed_target)
            mets["normed_target_std"] = jnp.std(normed_target)
            mets["reward_ema_005"] = new_ema[0]
            mets["reward_ema_095"] = new_ema[1]
        else:
            normed_target, normed_baseline, new_ema = target, baseline, ac_state.ema_vals
        if ac.actor_grad == "dynamics":
            objective = normed_target[1:]
        elif ac.actor_grad == "reinforce":
            advantage = normed_target[1:] - normed_baseline[1:]
            objective = policy.log_prob(sg(seq["action"][1:-1]))[..., None] * sg(advantage)
        else:
            raise NotImplementedError(ac.actor_grad)
        if isinstance(policy, D.SquashedNormal):
            ent = policy.entropy(key_ent)  # Monte-Carlo (SampleDist role)
        else:
            ent = policy.entropy()
        ent = ent[..., None]
        objective = objective + float(cfg.actor_ent) * ent
        mets["actor_ent"] = jnp.mean(ent)
        weight = sg(seq["weight"])
        actor_loss = -jnp.mean(weight[:-2] * objective)
        aux = dict(seq=seq, target=target, new_ema=new_ema, rewnorm=rewnorm_state, mets=mets)
        return actor_loss, aux

    (actor_loss, aux), actor_grads = jax.value_and_grad(actor_loss_fn, has_aux=True)(ac_state.actor_params)
    new_actor_params, new_actor_opt, amets = apply_updates_with_metrics(
        ac.actor_tx, actor_grads, ac_state.actor_opt, ac_state.actor_params, "actor")
    metrics.update(aux["mets"])
    metrics.update(amets)
    metrics["actor_loss"] = actor_loss

    seq = {k: sg(v) for k, v in aux["seq"].items()}
    target = sg(aux["target"])

    def critic_loss_fn(critic_params):
        dist = ac.critic.apply(critic_params, seq["feat"][:-1])
        weight = seq["weight"]
        loss = -jnp.mean(dist.log_prob(target)[..., None] * weight[:-1])
        return loss, jnp.mean(dist.mean)

    (critic_loss, critic_mean), critic_grads = jax.value_and_grad(critic_loss_fn, has_aux=True)(
        ac_state.critic_params)
    new_critic_params, new_critic_opt, cmets = apply_updates_with_metrics(
        ac.critic_tx, critic_grads, ac_state.critic_opt, ac_state.critic_params, "critic")
    metrics.update(cmets)
    metrics["critic_loss"] = critic_loss
    metrics["critic"] = critic_mean

    # slow target update (reference: update_slow_target, agent/dreamer.py:455-462)
    if cfg.slow_target:
        updates = ac_state.updates
        mix = jnp.where(updates == 0, 1.0, float(cfg.slow_target_fraction))
        do_update = (updates % int(cfg.slow_target_update)) == 0
        new_target = jax.tree_util.tree_map(
            lambda s, d: jnp.where(do_update, mix * s + (1 - mix) * d, d),
            new_critic_params, ac_state.target_critic_params)
    else:
        new_target = new_critic_params

    new_state = ACState(
        actor_params=new_actor_params,
        critic_params=new_critic_params,
        target_critic_params=new_target,
        actor_opt=new_actor_opt,
        critic_opt=new_critic_opt,
        updates=ac_state.updates + 1,
        ema_vals=aux["new_ema"],
        rewnorm=aux["rewnorm"],
    )
    prefix = f"{ac.name}_" if ac.name else ""
    metrics = {f"{prefix}{k}": v for k, v in metrics.items()}
    return new_state, metrics
