"""Preset tables mirroring the reference's Hydra config tree.

Sources (values transcribed, structure redesigned):
  train.yaml, collect_data.yaml, process_dataset.yaml (roots)
  agent/{genrl,dreamer,plan2explore}.yaml           (agent group)
  conf/defaults/{genrl,dreamer_v3,dreamer_v2}.yaml  (hyperparameter presets)
  conf/env/dmc_pixels.yaml                          (env preset)
  conf/train_mode/{train_model,train_behavior}.yaml (override bundles)
"""

from __future__ import annotations

from genrl_tpu.utils.config import Config

# ---- conf/defaults -----------------------------------------------------------

_GENRL_DEFAULTS = dict(
    img_size=64,
    rssm=dict(ensemble=1, hidden=1024, deter=1024, stoch=32, discrete=32,
              norm="layer", std_act="softplus", min_std=0.1, single_obs_posterior=True),
    discount_head=dict(layers=4, units=512, norm="none", dist="binary"),
    reward_head=dict(layers=4, units=1024, norm="layer", dist="twohot"),
    kl=dict(free=1.0, forward=False, balance=0.85, free_avg=False),
    loss_scales=dict(kl=0.6, reward=1.0, discount=1.0, proprio=1.0),
    model_opt=dict(opt="adam", lr=1e-4, eps=1e-8, clip=1000, wd=1e-6),
    replay=dict(capacity=20e6, ongoing=False, minlen=48, maxlen=48, prioritize_ends=False),
    decoder_inputs="stoch",
    image_dist="mse",
    actor=dict(layers=4, units=1024, norm="layer", dist="normal", min_std=0.1),
    critic=dict(layers=4, units=1024, norm="layer", dist="twohot"),
    actor_opt=dict(opt="adam", lr=3e-5, eps=1e-5, clip=100, wd=1e-6),
    critic_opt=dict(opt="adam", lr=3e-5, eps=1e-5, clip=100, wd=1e-6),
    discount=0.99,
    discount_lambda=0.95,
    slow_target=True,
    slow_target_update=100,
    slow_target_fraction=1,
    slow_baseline=True,
    reward_ema=True,
    acting_reward_fn="env_reward",
    clip_rewards="identity",
    batch_size=48,
    batch_length=48,
    imag_horizon=16,
    eval_state_mean=False,
    precision=16,
    train_every_actions=10,
    only_random_actions=False,
)

_DREAMER_V3 = dict(
    _GENRL_DEFAULTS,
    rssm=dict(ensemble=1, hidden=512, deter=512, stoch=32, discrete=32,
              norm="layer", std_act="softplus", min_std=0.1, single_obs_posterior=False),
    discount_head=dict(layers=4, units=512, norm="layer", dist="binary"),
    reward_head=dict(layers=4, units=512, norm="layer", dist="twohot"),
    replay=dict(capacity=2e6, ongoing=False, minlen=50, maxlen=50, prioritize_ends=False),
    decoder_inputs="feat",
    actor=dict(layers=4, units=512, norm="layer", dist="normal", min_std=0.1),
    critic=dict(layers=4, units=512, norm="layer", dist="twohot"),
    batch_size=50,
    batch_length=50,
    imag_horizon=15,
)

_DREAMER_V2 = dict(
    _DREAMER_V3,
    rssm=dict(ensemble=1, hidden=512, deter=512, stoch=32, discrete=32,
              norm="none", std_act="softplus", min_std=0.1, single_obs_posterior=False),
    discount_head=dict(layers=4, units=512, norm="none", dist="binary"),
    reward_head=dict(layers=4, units=512, norm="none", dist="mse"),
    kl=dict(free=1.0, forward=False, balance=0.8, free_avg=False),
    loss_scales=dict(kl=1.0, reward=1.0, discount=1.0, proprio=1.0),
    model_opt=dict(opt="adam", lr=3e-4, eps=1e-5, clip=1000, wd=1e-6),
    image_dist="normal_unit_std",
    actor=dict(layers=4, units=512, norm="none", dist="trunc_normal", min_std=0.1),
    critic=dict(layers=4, units=512, norm="none", dist="mse"),
    actor_opt=dict(opt="adam", lr=8e-5, eps=1e-5, clip=100, wd=1e-6),
    critic_opt=dict(opt="adam", lr=8e-5, eps=1e-5, clip=100, wd=1e-6),
    reward_ema=False,
)

# ---- conf/env ----------------------------------------------------------------

_DMC_PIXELS = dict(
    obs_type="pixels",
    action_repeat=2,
    encoder=dict(mlp_keys="$^", cnn_keys="observation", norm="layer", cnn_depth=48,
                 cnn_kernels=(4, 4, 4, 4), mlp_layers=(400, 400, 400, 400)),
    decoder=dict(mlp_keys="$^", cnn_keys="observation", norm="layer", cnn_depth=48,
                 cnn_kernels=(5, 5, 6, 6), mlp_layers=(400, 400, 400, 400)),
    pred_discount=False,
    imag_actor_grad="dynamics",
    actor_grad="dynamics",
)

_DMC_STATES = dict(
    _DMC_PIXELS,
    obs_type="states",
    encoder=dict(mlp_keys="observation", cnn_keys="$^", norm="layer", cnn_depth=48,
                 cnn_kernels=(4, 4, 4, 4), mlp_layers=(400, 400, 400, 400)),
    decoder=dict(mlp_keys="observation", cnn_keys="$^", norm="layer", cnn_depth=48,
                 cnn_kernels=(5, 5, 6, 6), mlp_layers=(400, 400, 400, 400)),
)

# ---- agent group (agent/*.yaml) ------------------------------------------------

_AGENT_DREAMER = dict(
    agent=dict(
        name="dreamer",
        grad_heads=("decoder", "reward"),
        reward_norm=dict(momentum=1.0, scale=1.0, eps=1e-8),
        actor_ent=3e-4,
    ),
)

_AGENT_GENRL = dict(
    agent=dict(
        name="genrl",
        grad_heads=("decoder",),
        reward_norm=dict(momentum=1.0, scale=1.0, eps=1e-8),
        actor_ent=0,
        additional_report_fns=("report_text2video",),
        clip_add_noise=0.0,
        clip_lafite_noise=0.5,
        connector=dict(token_dropout=0, loss_scale=1, denoising_ae=True,
                       detached_post=True, temporal_embeds=False, rescale_embeds=True),
        connector_rssm=dict(ensemble=1, hidden=1024, deter=1024, stoch=32, discrete=32,
                            norm="layer", std_act="softplus", min_std=0.1,
                            single_obs_posterior=False, learn_initial=True),
        connector_kl=dict(free=0.0, forward=True, balance=0.8, free_avg=False),
        imag_reward_fn=None,
        imag_reward_norm=dict(momentum=1.00, scale=1.0, eps=1e-8),
        imag_reward_args=dict(score_fn="max_cosine", sample_for_target=False,
                              # 'connector' (reference route: embed ->
                              # video_imagine) or 'posterior' (demo window
                              # encoded through the WM posterior; see
                              # GenRLAgent.make_posterior_target)
                              target_from="connector",
                              # saturating ceiling on the alignment reward
                              # (anti reward-hacking; see
                              # rewards/plugins.py:make_aligned_reward_fn)
                              score_clip=None,
                              # 'sample' (reference: score sampled latents)
                              # or 'mean': score EXPECTED stoch — sampled
                              # deltas are mostly categorical noise (see
                              # assembly._imag_reward_fn)
                              score_from="sample",
                              align_initial=False, weighted_align=False,
                              # reference batch-axis cumprod for parity
                              # audits (genrl_utils.py:330-333) — see
                              # rewards/plugins.py:aligned_similarity_reward
                              weighted_align_compat=False,
                              align_sequence=True, skip_first_target=True),
    ),
)

_AGENT_PLAN2EXPLORE = dict(
    agent=dict(
        name="plan2explore",
        grad_heads=("decoder",),
        reward_norm=dict(momentum=0.95, scale=1.0, eps=1e-8),
        actor_ent=0,
        disag_target="stoch",
        disag_log=False,
        disag_models=5,
        disag_offset=1,
        disag_action_cond=True,
        disag_units=400,
        disag_layers=4,
        expl_intr_scale=0.9,
        expl_extr_scale=0.0,
    ),
)

# ---- train_mode override bundles (conf/train_mode/*.yaml) ----------------------

_TRAIN_MODE_MODEL = dict(
    num_train_frames=5_000_010,
    visual_every_frames=250_000,
    train_world_model=True,
    train_connector=True,
    reset_world_model=True,
    reset_connector=True,
)

_TRAIN_MODE_BEHAVIOR = dict(
    num_train_frames=500_010,
    batch_size=32,
    batch_length=32,
    agent=dict(imag_reward_fn="video_text_reward"),
    eval_modality="task_imag",
)

PRESETS = {
    "conf/defaults": {"genrl": _GENRL_DEFAULTS, "dreamer_v3": _DREAMER_V3, "dreamer_v2": _DREAMER_V2},
    "conf/env": {"dmc_pixels": _DMC_PIXELS, "dmc_states": _DMC_STATES},
    "agent": {"genrl": _AGENT_GENRL, "dreamer": _AGENT_DREAMER, "plan2explore": _AGENT_PLAN2EXPLORE},
    "train_mode": {"train_model": _TRAIN_MODE_MODEL, "train_behavior": _TRAIN_MODE_BEHAVIOR},
}

# ---- roots ---------------------------------------------------------------------

TRAIN_BASE = dict(
    _GENRL_DEFAULTS,
    **_DMC_PIXELS,
    **_AGENT_GENRL,
    label="default",
    task="stickman_walk",
    num_train_frames=200_010,
    num_seed_frames=400,
    eval_every_frames=5_000,
    eval_modality=None,
    num_eval_episodes=10,
    snapshot_dir="snapshots",
    snapshot_every_frames=50_000,
    save_every_frames=1000,
    # grad steps fused into one dispatched program (lax.scan in the train jit)
    # on the fully on-device paths; amortizes host dispatch / remote-link RTT
    steps_per_dispatch=8,
    seed=1,
    device="tpu",
    use_tb=False,
    use_wandb=False,
    viclip_encode=True,
    viclip_model="internvideo2",
    clip_add_noise=0.0,
    clip_hd_rendering=False,
    experiment="train",
    project_name="genrl",
    log_every_frames=1_000,
    visual_every_frames=100_000_000,
    log_episodes_every_frames=100_000,
    workdir=None,
    train_connector=False,
    train_world_model=False,
    # finetune phase (reference: agent/genrl.py:55-59): imag behavior acts,
    # connector frozen, reward head joins grad_heads, train on env data
    finetune=False,
    # mean-center + renormalize clip_video AND the prompt embed with shared
    # dataset statistics (rewards/embed_stats.py); needed when the embedder's
    # space is collapsed (e.g. randomly-initialized InternVideo2)
    embed_whiten=False,
    reset_connector=False,
    reset_world_model=False,
    reset_imag_behavior=True,
    task_snapshot=None,
    seed_snapshot=None,
    agent_name_snapshot=None,
    snapshot_load_dir=None,
    # with snapshot_load_dir: graft ONLY wm_params from the (possibly
    # foreign-agent) donor snapshot; everything else starts fresh
    load_wm_only=False,
    # config-matching workdir search (replaces the reference's wandb run
    # search, train.py:72-133, for zero-egress deployments)
    snapshot_search_dir=None,
    replay_load_dir=None,
    snapshot_step=None,
    train_from_data=True,
    start_from_video="mix",
    mix_random_actions=True,
    imag_warmup_steps=5,
    task_prompt=None,
    task_video=None,
    # explicit demo-window .npz for target_from=posterior (defaults to the
    # .npz sibling of task_video that scripts/make_video_prompt.py writes)
    demo_npz=None,
    prompt_embed_path=None,
    models_root="models",
    torch_snapshot_path=None,   # convert-on-load of reference .pt snapshots
    # TPU-native additions
    mesh=dict(data=-1, model=1, dcn=1, zero1=False),  # -1: all remaining devices; dcn>1 adds a multi-slice axis; zero1 shards optimizer state
    replay_device=True,            # HBM-resident replay when the dataset fits
    use_pallas=True,
    profile=False,
)

COLLECT_BASE = dict(
    _DREAMER_V3,
    **_DMC_PIXELS,
    **_AGENT_PLAN2EXPLORE,
    task="stickman_walk",
    num_train_frames=2_000_010,
    num_seed_frames=4000,
    eval_every_frames=10_000_000,  # no eval by default while collecting
    num_eval_episodes=3,
    snapshot_every_frames=100_000,
    save_every_frames=10_000,
    seed=1,
    device="tpu",
    use_tb=False,
    use_wandb=False,
    viclip_encode=False,
    viclip_model="internvideo2",
    clip_hd_rendering=False,
    # N lockstep collection envs sharing one batched policy call per step
    # (1 = the reference's sequential collector)
    num_collect_envs=1,
    # foreign-snapshot WM warm start (params only, counters stay 0); the
    # donor must share model hyperparameters — see checkpoint.load_wm_subtree
    snapshot_load_dir=None,
    experiment="collect",
    project_name="genrl",
    log_every_frames=1_000,
    visual_every_frames=100_000_000,
    log_episodes_every_frames=100_000,
    workdir=None,
    eval_modality="task",
    mesh=dict(data=-1, model=1, dcn=1, zero1=False),
    use_pallas=True,
    profile=False,
)

PROCESS_BASE = dict(
    img_size=64,
    task="stickman_walk",
    dataset_dir=None,
    seed=1,
    device="tpu",
    viclip_model="internvideo2",
    models_root="models",
    batch_windows=64,
    n_frames=8,
    skip_existing=True,
    mesh=dict(data=-1, model=1, dcn=1, zero1=False),
)
