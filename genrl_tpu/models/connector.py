"""GenRL connector (VideoSSM) and aligner (UNetDenoiser).

Rebuild of agent/video_utils.py:27-240. The connector is an RSSM whose
"action" is [video_embed(512) ‖ temporal one-hot(n_frames)] and which has no
posterior networks; it learns to reproduce the world model's posterior latent
trajectory from foundation-model video embeddings. Its training update is a
teacher-forced prior rollout (the carry's `cell_input` entry is swapped for
the frozen WM posterior each step) — here a single `lax.scan`, not the
reference's per-timestep Python loop (video_utils.py:166-187).

The aligner is a 1-D MLP "U-Net" denoiser trained with a cosine-distance
loss to map noised/out-of-distribution CLIP embeddings back onto the video
embedding manifold (video_utils.py:27-61, 148-156).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genrl_tpu.models.layers import NormedLinear, ResidualLinear
from genrl_tpu.models.rssm import RSSM, State, swap_bt

sg = jax.lax.stop_gradient


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class UNetDenoiser(nn.Module):
    """Residual-MLP U-Net with skip concats (reference: video_utils.py:27-61)."""

    in_channels: int
    mid_channels: int
    n_layers: int = 2
    norm: str = "layer"
    act: str = "SiLU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        down_res = []
        for i in range(self.n_layers):
            feats = self.mid_channels if i == self.n_layers - 1 else self.in_channels
            x = ResidualLinear(feats, norm=self.norm, act=self.act, dtype=self.dtype, name=f"down{i}")(x)
            down_res.append(x)
        for i in range(self.n_layers):
            x = ResidualLinear(self.mid_channels, norm=self.norm, act=self.act, dtype=self.dtype, name=f"mid{i}")(x)
        down_res.reverse()
        for i, res in enumerate(down_res):
            if i == 0:
                x = ResidualLinear(self.in_channels, norm="none", act="none", dtype=self.dtype, name=f"up{i}")(
                    jnp.concatenate([x, res], -1)
                )
            else:
                x = ResidualLinear(self.in_channels, norm=self.norm, act=self.act, dtype=self.dtype, name=f"up{i}")(
                    jnp.concatenate([x, res], -1)
                )
        return x


class VideoSSM(RSSM):
    """Connector sequence model (reference: VideoSSM, video_utils.py:64-240).

    `action_dim` must equal viclip_emb_dim + n_frames. Set
    `has_posterior=False` when constructing (the posterior nets are deleted in
    the reference, video_utils.py:96-98).
    """

    n_frames: int = 8
    temporal_embeds: bool = False
    detached_post: bool = True
    token_dropout: float = 0.0
    loss_scale: float = 1.0
    rescale_embeds: bool = False
    clip_add_noise: float = 0.0
    clip_lafite_noise: float = 0.0
    denoising_ae: bool = False
    learn_initial: bool = True
    connector_kl: Any = None  # dict(free, forward, balance, free_avg)

    def setup(self):
        super().setup()
        self.viclip_emb_dim = self.action_dim - self.n_frames
        if self.denoising_ae:
            self.aligner = UNetDenoiser(
                self.viclip_emb_dim, self.viclip_emb_dim // 2, n_layers=2, norm="layer", act="SiLU",
                dtype=self.dtype, name="aligner",
            )
        if self.learn_initial:
            # 3-layer MLP: embed-action -> deter (reference: video_utils.py:87-95)
            self.initial_state_pred = nn.Sequential([
                NormedLinear(self.hidden, norm=self.norm, act="SiLU", dtype=self.dtype),
                NormedLinear(self.hidden, norm=self.norm, act="SiLU", dtype=self.dtype),
                nn.Dense(self.deter, dtype=self.dtype, param_dtype=jnp.float32),
            ])

    # ---- initial state ------------------------------------------------------
    def initial_learned(self, batch_size: int, init_embed: jax.Array, key: jax.Array, sample: bool = True) -> State:
        """Learned initial state from an embed-action (video_utils.py:100-112)."""
        init = self.initial(batch_size)
        if not self.learn_initial:
            return init
        if init_embed.shape[-1] == self.viclip_emb_dim:
            pad = jnp.zeros(init_embed.shape[:-1] + (self.n_frames,), init_embed.dtype)
            init_embed = jnp.concatenate([init_embed, pad], -1)
        deter = self.initial_state_pred(init_embed.astype(self.dtype)).astype(jnp.float32)
        init["deter"] = deter
        key_ens, key_sample = jax.random.split(key)
        stats = self._suff_stats_ensemble(deter, key_ens)
        dist = self.get_dist(stats)
        init["stoch"] = dist.sample(key_sample) if sample else dist.mode()
        init.update(stats)
        return init

    # ---- embeds -> actions ---------------------------------------------------
    def get_action(self, video_embed: jax.Array) -> jax.Array:
        """[B, T, E] -> [B, T, E + n_frames] with temporal one-hots
        (reference: video_utils.py:114-125)."""
        B, T = video_embed.shape[:2]
        if self.rescale_embeds:
            video_embed = video_embed * np.sqrt(self.viclip_emb_dim)
        temporal = jax.nn.one_hot(jnp.arange(T) % self.n_frames, self.n_frames)
        temporal = jnp.broadcast_to(temporal[None], (B, T, self.n_frames))
        if not self.temporal_embeds:
            temporal = temporal * 0
        return jnp.concatenate([video_embed, temporal.astype(video_embed.dtype)], -1)

    # ---- training update ------------------------------------------------------
    def update(self, video_embed: jax.Array, wm_post: State, key: jax.Array):
        """Teacher-forced connector loss (reference: video_utils.py:127-207).

        video_embed: [B, T, E] per-step sliding-window embeds (clip_video key);
        wm_post: frozen world-model posterior states with [B, T] leading dims.
        Returns (loss, metrics).
        """
        n = self.n_frames
        B, T = video_embed.shape[:2]
        metrics = {}
        loss = 0.0
        key_noise, key_lafite, key_drop, key_roll, key_init, key_init2, key_roll2 = jax.random.split(key, 7)

        # one embed per n-frame chunk, broadcast across the chunk
        video_embed = video_embed[:, n - 1 :: n]
        video_embed = jnp.repeat(video_embed[:, :, None], n, axis=2).reshape(B, T, -1)
        orig_video_embed = video_embed

        if self.clip_add_noise > 0:
            video_embed = video_embed + jax.random.normal(key_noise, video_embed.shape) * self.clip_add_noise
            video_embed = l2_normalize(video_embed)
        if self.clip_lafite_noise > 0:
            normed_noise = l2_normalize(jax.random.normal(key_lafite, video_embed.shape))
            video_embed = (1 - self.clip_lafite_noise) * video_embed + self.clip_lafite_noise * normed_noise
            video_embed = l2_normalize(video_embed)

        if self.denoising_ae:
            denoised = l2_normalize(self.aligner(video_embed).astype(jnp.float32))
            denoising_loss = 1.0 - jnp.mean(jnp.sum(denoised * orig_video_embed, -1)
                                            / jnp.maximum(jnp.linalg.norm(orig_video_embed, axis=-1), 1e-8))
            loss = loss + denoising_loss
            metrics["aligner_cosine_distance"] = denoising_loss
            video_embed = orig_video_embed  # the denoiser owns denoising at inference

        embed_actions = self.get_action(video_embed)
        if self.detached_post:
            wm_post = {k: sg(v) for k, v in wm_post.items()}

        # teacher-forced prior rollout: carry's cell_input is swapped for the WM
        # posterior of the previous step each step
        init = self.initial_learned(B, embed_actions[:, 0], key_init)
        post_cell = {"stoch": wm_post["stoch"], "deter": wm_post["deter"]}
        prev_cell_in = jnp.concatenate(
            [self.get_cell_input(init)[:, None], self.get_cell_input(post_cell)[:, :-1]], axis=1
        )
        if self.discrete:
            # cell_input='stoch': un-flatten back for state dict carry
            prev_cell_vals = prev_cell_in.reshape(B, T, *wm_post[self.cell_input].shape[2:])
        else:
            prev_cell_vals = prev_cell_in

        if self.fused and self.ensemble == 1 and self.cell_input == "stoch":
            # teacher-forced rollout with fully-known inputs: hoist the input
            # projections into one [B*T] matmul, scan only the deter carry
            prev_stoch = prev_cell_vals
            if self.token_dropout > 0:
                keep = (jax.random.uniform(key_drop, (B, T)) > self.token_dropout).astype(jnp.float32)
                prev_stoch = prev_stoch * keep.reshape((B, T) + (1,) * (prev_stoch.ndim - 2))
            prev_in = prev_stoch.reshape(B, T, -1) if self.discrete else prev_stoch
            inp = self.img_in(jnp.concatenate(
                [prev_in.astype(self.dtype), embed_actions.astype(self.dtype)], -1))
            x_proj = self.cell.project_input(inp)
            deters = self._fused_deter_rollout(swap_bt(x_proj), None, init["deter"])
            deter = swap_bt(deters)
            prior_stats = self._suff_stats_ensemble(deter, None)
            prior_dist = self.get_dist(prior_stats)
            prior = {"stoch": prior_dist.sample(key_roll), "deter": deter, **prior_stats}
        else:
            keys = jax.random.split(key_roll, T)

            def step(mod, carry, x):
                a, prev_cell, k, drop_key = x
                prev_state = dict(carry)
                prev_state[mod.cell_input] = prev_cell
                if mod.token_dropout > 0:
                    keep = (jax.random.uniform(drop_key, (B,)) > mod.token_dropout).astype(jnp.float32)
                    prev_state["stoch"] = prev_state["stoch"] * keep.reshape((B,) + (1,) * (prev_state["stoch"].ndim - 1))
                prior = mod.img_step(prev_state, a, k)
                return prior, prior

            scan = nn.scan(step, variable_broadcast="params", split_rngs={"params": False}, in_axes=0, out_axes=0)
            drop_keys = jax.random.split(key_drop, T)
            _, priors = scan(
                self, init, (swap_bt(embed_actions), swap_bt(prev_cell_vals), keys, drop_keys)
            )
            prior = {k: swap_bt(v) for k, v in priors.items()}

        kl_cfg = dict(self.connector_kl or dict(free=0.0, forward=True, balance=0.8, free_avg=False))
        kl_loss, kl_value = self.kl_loss(wm_post, prior, **kl_cfg)
        loss = loss + self.loss_scale * kl_loss
        metrics["connector_kl"] = jnp.mean(kl_value)

        # initial-state KL metric: predict chunk-start posteriors from their embed
        # (reference: video_utils.py:197-205)
        chunks = T // n
        if chunks > 1:
            ve = video_embed.reshape(B, chunks, n, -1)[:, 1:, 0].reshape(B * (chunks - 1), 1, -1)
            ea = self.get_action(ve)
            wp = {
                k: v.reshape(B, chunks, n, *v.shape[2:])[:, 1:, 0].reshape((B * (chunks - 1),) + v.shape[2:])
                for k, v in wm_post.items()
            }
            a0 = ea[:, 0]
            prev = self.initial_learned(wp["stoch"].shape[0], a0, key_init2)
            pr0 = self.img_step(prev, a0, key_roll2)
            init_kl_loss, init_kl_value = self.kl_loss(wp, pr0, **kl_cfg)
            metrics["connector_initial_kl"] = jnp.mean(init_kl_value)
            loss = loss + 0.0 * init_kl_loss  # metric only, as in the reference
        return loss, metrics

    # ---- inference ------------------------------------------------------------
    def video_imagine(
        self,
        video_embed: jax.Array,
        key: jax.Array,
        dreamer_init: Optional[State] = None,
        sample: bool = True,
        reset_every_n_frames: bool = True,
        denoise: bool = False,
    ) -> State:
        """Generate a latent trajectory from video/text embeds
        (reference: video_utils.py:209-240). T must be a multiple of n_frames
        when reset_every_n_frames."""
        n = self.n_frames
        B, T = video_embed.shape[:2]
        if self.denoising_ae and denoise:
            video_embed = l2_normalize(self.aligner(video_embed).astype(jnp.float32))
        action = self.get_action(video_embed)
        key_init, key_roll = jax.random.split(key)
        init = self.initial_learned(B, action[:, 0], key_init, sample=sample)
        if dreamer_init is not None:
            init[self.cell_input] = dreamer_init[self.cell_input]

        if reset_every_n_frames:
            # single scan over T with a carry reset at each n-frame boundary
            # (reference: the chunked python loop video_utils.py:223-237; a
            # per-chunk scan would unroll T/n programs and blow up compile
            # time for long t2v durations) — at a boundary the carry becomes
            # a fresh zero state except cell_input, which carries over
            keys = jax.random.split(key_roll, T)
            t = jnp.arange(T)
            reset = (t % n == 0) & (t > 0)

            def step(mod, carry, x):
                a, k, r = x
                zero = mod.initial(a.shape[0])
                prev = {kk: vv if kk == mod.cell_input else jnp.where(r, zero[kk], vv)
                        for kk, vv in carry.items() if kk in zero}
                prev[mod.cell_input] = carry[mod.cell_input]
                prior = mod.img_step(prev, a, k, sample)
                return prior, prior

            scan = nn.scan(step, variable_broadcast="params",
                           split_rngs={"params": False}, in_axes=0, out_axes=0)
            _, priors = scan(self, init, (swap_bt(action), keys, reset))
            return {k: swap_bt(v) for k, v in priors.items()}
        return self.imagine(action, key_roll, init, sample=sample)
