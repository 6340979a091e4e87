"""Ensemble Recurrent State-Space Model (RSSM), TPU-native.

Rebuild of the reference EnsembleRSSM (agent/dreamer_utils.py:302-555). The
reference runs its posterior/prior rollouts as Python loops over time
(`static_scan`, dreamer_utils.py:255-300) — here `observe`/`imagine` are
single `jax.lax.scan`s over time-major arrays, compiled once by XLA, which is
the single highest-leverage win over the reference design (SURVEY.md §7.3).

States are dicts of arrays:
  discrete latents:  {logit: [B, S, D], stoch: [B, S, D], deter: [B, deter]}
  continuous:        {mean, std, stoch: [B, S], deter: [B, deter]}

All sampling takes explicit PRNG keys (replacing torch's global RNG).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genrl_tpu.models.layers import GRUCell, NormedLinear, get_act
from genrl_tpu.ops import dists as D

sg = jax.lax.stop_gradient

State = Dict[str, jax.Array]


def swap_bt(x: jax.Array) -> jax.Array:
    """(B, T, ...) <-> (T, B, ...)."""
    return jnp.swapaxes(x, 0, 1)


def dist_from_stats(stats: State, discrete: int, unif_mix: float = 0.99):
    """Latent distribution from sufficient statistics
    (reference: EnsembleRSSM.get_dist, dreamer_utils.py:410-420)."""
    if discrete:
        return D.OneHotDist(stats["logit"], unif_mix=unif_mix, independent_dims=1)
    return D.DiagNormal(stats["mean"], stats["std"], event_dims=1)


def unif_dist_from_stats(stats: State, discrete: int, unif_mix: float = 0.99):
    """Uniform/standard-normal latent dist (reference: get_unif_dist :422-430)."""
    if discrete:
        return D.OneHotDist(jnp.ones_like(stats["logit"]), unif_mix=unif_mix, independent_dims=1)
    return D.DiagNormal(jnp.zeros_like(stats["mean"]), jnp.ones_like(stats["std"]), event_dims=1)


class RSSM(nn.Module):
    action_dim: int = -1
    embed_dim: int = -1
    ensemble: int = 1
    stoch: int = 32
    deter: int = 1024
    hidden: int = 1024
    discrete: int = 32  # 0 => continuous latents
    act: str = "SiLU"
    norm: str = "layer"
    std_act: str = "softplus"
    min_std: float = 0.1
    single_obs_posterior: bool = False
    cell_input: str = "stoch"
    unif_mix: float = 0.99
    has_posterior: bool = True
    fused: bool = True  # hoist batchable matmuls out of scans when possible
    use_pallas_gru: bool = False  # single-launch Pallas GRU rollout (TPU)
    dtype: Any = jnp.float32

    def setup(self):
        assert self.action_dim > 0
        self.cell = GRUCell(self.deter, norm=True, dtype=self.dtype, name="cell")
        self.img_in = NormedLinear(self.hidden, norm=self.norm, act=self.act, dtype=self.dtype, name="img_in")
        self.ensemble_img_out = [
            NormedLinear(self.hidden, norm=self.norm, act=self.act, dtype=self.dtype, name=f"ens_img_out{k}")
            for k in range(self.ensemble)
        ]
        stats_dim = self.stoch * self.discrete if self.discrete else 2 * self.stoch
        self.ensemble_img_dist = [
            nn.Dense(stats_dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"ens_img_dist{k}")
            for k in range(self.ensemble)
        ]
        if self.has_posterior:
            self.obs_out = NormedLinear(self.hidden, norm=self.norm, act=self.act, dtype=self.dtype, name="obs_out")
            self.obs_dist = nn.Dense(stats_dim, dtype=self.dtype, param_dtype=jnp.float32, name="obs_dist")

    # ---- sizes / features -------------------------------------------------
    def get_stoch_size(self) -> int:
        return self.stoch * self.discrete if self.discrete else self.stoch

    def get_deter_size(self) -> int:
        return self.deter

    def get_feat_size(self) -> int:
        return self.get_deter_size() + self.get_stoch_size()

    def get_stoch(self, state: State) -> jax.Array:
        stoch = state["stoch"]
        if self.discrete:
            stoch = stoch.reshape(stoch.shape[:-2] + (self.stoch * self.discrete,))
        return stoch

    def get_deter(self, state: State) -> jax.Array:
        return state["deter"]

    def get_feat(self, state: State) -> jax.Array:
        return jnp.concatenate([self.get_stoch(state), self.get_deter(state)], -1)

    def get_cell_input(self, state: State) -> jax.Array:
        return {"stoch": self.get_stoch, "deter": self.get_deter, "feat": self.get_feat}[
            self.cell_input
        ](state)

    def get_cell_input_size(self) -> int:
        return {
            "stoch": self.get_stoch_size,
            "deter": self.get_deter_size,
            "feat": self.get_feat_size,
        }[self.cell_input]()

    # ---- distributions ----------------------------------------------------
    def get_dist(self, stats: State):
        return dist_from_stats(stats, self.discrete, self.unif_mix)

    def get_unif_dist(self, stats: State):
        return unif_dist_from_stats(stats, self.discrete, self.unif_mix)

    # ---- states -----------------------------------------------------------
    def initial(self, batch_size: int) -> State:
        if self.discrete:
            return dict(
                logit=jnp.zeros((batch_size, self.stoch, self.discrete), jnp.float32),
                stoch=jnp.zeros((batch_size, self.stoch, self.discrete), jnp.float32),
                deter=jnp.zeros((batch_size, self.deter), jnp.float32),
            )
        return dict(
            mean=jnp.zeros((batch_size, self.stoch), jnp.float32),
            std=jnp.zeros((batch_size, self.stoch), jnp.float32),
            stoch=jnp.zeros((batch_size, self.stoch), jnp.float32),
            deter=jnp.zeros((batch_size, self.deter), jnp.float32),
        )

    # ---- steps ------------------------------------------------------------
    def _suff_stats(self, x: jax.Array) -> State:
        """Split a projection into sufficient stats
        (reference: _suff_stats_layer, dreamer_utils.py:505-521)."""
        x = x.astype(jnp.float32)
        if self.discrete:
            logit = x.reshape(x.shape[:-1] + (self.stoch, self.discrete))
            return {"logit": logit}
        mean, std = jnp.split(x, 2, -1)
        std = {
            "softplus": lambda s: jax.nn.softplus(s),
            "sigmoid": lambda s: jax.nn.sigmoid(s),
            "sigmoid2": lambda s: 2 * jax.nn.sigmoid(s / 2),
        }[self.std_act](std)
        return {"mean": mean, "std": std + self.min_std}

    def _suff_stats_ensemble(self, deter: jax.Array, key: Optional[jax.Array]) -> State:
        """Prior statistics; with ensemble>1 a random member is picked per call
        (reference: get_stoch_stats_from_deter_state, dreamer_utils.py:475-503)."""
        stats = []
        for k in range(self.ensemble):
            x = self.ensemble_img_out[k](deter.astype(self.dtype))
            stats.append(self._suff_stats(self.ensemble_img_dist[k](x)))
        if self.ensemble == 1:
            return stats[0]
        stacked = {k: jnp.stack([s[k] for s in stats], 0) for k in stats[0]}
        idx = jax.random.randint(key, (), 0, self.ensemble)
        return {k: jnp.take(v, idx, axis=0) for k, v in stacked.items()}

    def img_step(self, prev_state: State, prev_action: jax.Array, key: jax.Array, sample: bool = True) -> State:
        """One prior step: GRU core + ensemble prior stats
        (reference: img_step, dreamer_utils.py:459-473)."""
        key_ens, key_sample = jax.random.split(key)
        prev_in = self.get_cell_input(prev_state)
        x = jnp.concatenate([prev_in.astype(self.dtype), prev_action.astype(self.dtype)], -1)
        x = self.img_in(x)
        deter = self.cell(x, prev_state["deter"]).astype(jnp.float32)
        stats = self._suff_stats_ensemble(deter, key_ens)
        dist = self.get_dist(stats)
        stoch = dist.sample(key_sample) if sample else dist.mode()
        return {"stoch": stoch, "deter": deter, **stats}

    def get_post_stoch(self, embed: jax.Array, prior: State, key: jax.Array, sample: bool = True):
        """Posterior stats from (deter, embed) (reference: get_post_stoch :442-457)."""
        if self.single_obs_posterior:
            x = embed
        else:
            x = jnp.concatenate([prior["deter"], embed], -1)
        x = self.obs_out(x.astype(self.dtype))
        stats = self._suff_stats(self.obs_dist(x))
        dist = self.get_dist(stats)
        stoch = dist.sample(key) if sample else dist.mode()
        return stoch, stats

    def obs_step(
        self,
        prev_state: State,
        prev_action: jax.Array,
        embed: jax.Array,
        is_first: jax.Array,
        key: jax.Array,
        should_sample: bool = True,
    ) -> Tuple[State, State]:
        """Posterior + prior step with is_first reset masking
        (reference: obs_step, dreamer_utils.py:432-440)."""
        key_img, key_post = jax.random.split(key)
        mask = (1.0 - is_first.astype(jnp.float32))
        bshape = mask.shape + (1,) * (prev_action.ndim - mask.ndim)
        prev_state = {k: v * mask.reshape(mask.shape + (1,) * (v.ndim - mask.ndim)) for k, v in prev_state.items()}
        prev_action = prev_action * mask.reshape(bshape).astype(prev_action.dtype)
        prior = self.img_step(prev_state, prev_action, key_img, should_sample)
        stoch, stats = self.get_post_stoch(embed, prior, key_post, should_sample)
        post = {"stoch": stoch, "deter": prior["deter"], **stats}
        return post, prior

    # ---- rollouts (lax.scan) ----------------------------------------------
    def observe(
        self,
        embed: jax.Array,
        action: jax.Array,
        is_first: jax.Array,
        key: jax.Array,
        state: Optional[State] = None,
        should_sample: bool = True,
    ) -> Tuple[State, State]:
        """Posterior rollout over a (B, T) batch -> (post, prior) with (B, T) leading.

        With single_obs_posterior (the GenRL preset) the posterior depends
        only on the embedding, so everything except the deter recurrence is
        hoisted out of the scan into batched [B*T] matmuls (`_observe_fused`);
        otherwise the general per-step scan runs."""
        if self.fused and self.single_obs_posterior and self.ensemble == 1 and self.cell_input == "stoch":
            return self._observe_fused(embed, action, is_first, key, state, should_sample)
        B, T = action.shape[:2]
        if state is None:
            state = self.initial(B)
        keys = jax.random.split(key, T)
        xs = (swap_bt(action), swap_bt(embed), swap_bt(is_first), keys)

        def step(mod, carry, x):
            a, e, f, k = x
            post, prior = mod.obs_step(carry, a, e, f, k, should_sample)
            return post, (post, prior)

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False}, in_axes=0, out_axes=0)
        _, (post, prior) = scan(self, state, xs)
        post = {k: swap_bt(v) for k, v in post.items()}
        prior = {k: swap_bt(v) for k, v in prior.items()}
        return post, prior

    def _fused_deter_rollout(self, x_proj: jax.Array, reset_mask: Optional[jax.Array],
                             deter0: jax.Array) -> jax.Array:
        """Minimal sequential core: deter[t] = GRU_step(x_proj[t], deter[t-1]).
        x_proj: time-major [T, B, 3*deter] precomputed input projections;
        reset_mask: [T, B, 1] multiplied into the carry (is_first resets).
        Returns time-major deter sequence [T, B, deter]. With use_pallas_gru
        the whole rollout is ONE Pallas kernel launch (gru_scan.py)."""
        if reset_mask is None:
            mask = jnp.ones(x_proj.shape[:2], jnp.float32)
        else:
            mask = reset_mask[..., 0]
        return self.cell.step_seq(x_proj, mask, deter0,
                                  use_pallas=self.use_pallas_gru)

    def _observe_fused(self, embed, action, is_first, key, state=None, should_sample=True):
        """Batched-matmul observe for single_obs_posterior models: posterior
        stats/samples, GRU input projections and prior stats each run as ONE
        [B*T]-batched MXU matmul; the lax.scan carries only deter."""
        B, T = action.shape[:2]
        if state is None:
            state = self.initial(B)
        k_post, k_prior = jax.random.split(key)

        # posterior from embed alone (reference: get_post_stoch with
        # single_obs_posterior, dreamer_utils.py:442-457)
        x = self.obs_out(embed.astype(self.dtype))
        post_stats = self._suff_stats(self.obs_dist(x))
        post_dist = self.get_dist(post_stats)
        post_stoch = post_dist.sample(k_post) if should_sample else post_dist.mode()

        # previous-step latents with is_first masking
        mask = 1.0 - is_first.astype(jnp.float32)  # [B, T]
        prev_stoch = jnp.concatenate([state["stoch"][:, None], post_stoch[:, :-1]], 1)
        prev_stoch = prev_stoch * mask.reshape(mask.shape + (1,) * (prev_stoch.ndim - 2))
        prev_action = action * mask[..., None].astype(action.dtype)
        if self.discrete:
            prev_in = prev_stoch.reshape(B, T, self.stoch * self.discrete)
        else:
            prev_in = prev_stoch

        # hoisted input projections: [B, T, hidden] -> [B, T, 3*deter]
        inp = self.img_in(jnp.concatenate(
            [prev_in.astype(self.dtype), prev_action.astype(self.dtype)], -1))
        x_proj = self.cell.project_input(inp)

        deters = self._fused_deter_rollout(
            swap_bt(x_proj), swap_bt(mask)[..., None], state["deter"])
        deter = swap_bt(deters)  # [B, T, deter]

        prior_stats = self._suff_stats_ensemble(deter, None)
        prior_dist = self.get_dist(prior_stats)
        prior_stoch = prior_dist.sample(k_prior) if should_sample else prior_dist.mode()

        post = {"stoch": post_stoch, "deter": deter, **post_stats}
        prior = {"stoch": prior_stoch, "deter": deter, **prior_stats}
        return post, prior

    def imagine(self, action: jax.Array, key: jax.Array, state: Optional[State] = None, sample: bool = True) -> State:
        """Prior rollout driven by an action sequence (B, T, A) -> states (B, T)."""
        B, T = action.shape[:2]
        if state is None:
            state = self.initial(B)
        keys = jax.random.split(key, T)

        def step(mod, carry, x):
            a, k = x
            prior = mod.img_step(carry, a, k, sample)
            return prior, prior

        scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False}, in_axes=0, out_axes=0)
        _, priors = scan(self, state, (swap_bt(action), keys))
        return {k: swap_bt(v) for k, v in priors.items()}

    # ---- losses -----------------------------------------------------------
    def kl_loss(self, post: State, prior: State, forward: bool, balance: float, free: float, free_avg: bool):
        """KL with balancing and free bits (reference: kl_loss, dreamer_utils.py:534-555)."""
        sgd = lambda d: {k: sg(v) for k, v in d.items()}
        lhs, rhs = (prior, post) if forward else (post, prior)
        mix = balance if forward else (1.0 - balance)
        if balance == 0.5:
            value = D.kl_divergence(self.get_dist(lhs), self.get_dist(rhs))
            loss = jnp.mean(jnp.maximum(value, free))
        else:
            value_lhs = value = D.kl_divergence(self.get_dist(lhs), self.get_dist(sgd(rhs)))
            value_rhs = D.kl_divergence(self.get_dist(sgd(lhs)), self.get_dist(rhs))
            if free_avg:
                loss_lhs = jnp.maximum(jnp.mean(value_lhs), free)
                loss_rhs = jnp.maximum(jnp.mean(value_rhs), free)
            else:
                loss_lhs = jnp.mean(jnp.maximum(value_lhs, free))
                loss_rhs = jnp.mean(jnp.maximum(value_rhs, free))
            loss = mix * loss_lhs + (1.0 - mix) * loss_rhs
        return loss, value
