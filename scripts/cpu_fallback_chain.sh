#!/bin/sh
# CPU insurance for the round-3 headline (prompt→behavior transfer) while the
# TPU relay is down: the SAME chain as auto_resume_r3b.sh stages 2-3 at
# reduced scale on the host CPU (JAX_PLATFORMS=cpu honored by the CLIs).
# Writes to evidence/pipeline/cpu_fallback/. If the relay returns, KILL this
# (kill $(cat /tmp/cpu_fallback.pid)) so the TPU runner gets the whole core.
#
# Scale rationale: 1-core CPU manages a few grad-steps/min at full model —
# nowhere near the 160k-step TPU budget; the goal is an honest eval.csv TREND
# off the random floor (0.0036), not the ≥0.2 target.
set -x
cd /root/repo
export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
TASK=stickman_walk
EV=evidence/pipeline
OUT=$EV/cpu_fallback

# measured on this 1-core VM: ~12 s/step at 16x16 (256 frames), so the
# default is 8x16 (~6 s/step) — maximizes grad steps while keeping
# batch_length >= imag_horizon
WM_STEPS=${WM_STEPS:-3000}
BEH_STEPS=${BEH_STEPS:-2500}
BS=${BS:-8}
BL=${BL:-16}

# Reduced model for 1-core CPU: the full 1024-dim WM measures 27 s/step
# (runs/cpu_probe.log) — 30h for 4k steps. 256-dim + half conv depth keeps
# the architecture (32x32 categorical latents, connector, same losses) at
# ~16x less MLP/GRU and ~4x less conv compute.
SMALL="rssm.hidden=256 rssm.deter=256
reward_head.layers=2 reward_head.units=256
discount_head.layers=2 discount_head.units=256
actor.layers=2 actor.units=256 critic.layers=2 critic.units=256
agent.connector_rssm.hidden=256 agent.connector_rssm.deter=256
encoder.cnn_depth=24 decoder.cnn_depth=24"

echo "cpu_fallback: WM ${WM_STEPS} steps @${BS}x${BL}" > runs/cpu_fallback.status
timeout ${WM_T:-16800} python -u train.py task=$TASK train_world_model=True \
    train_connector=True replay_load_dir=$EV/dataset_r3 embed_whiten=True \
    num_train_frames=$((WM_STEPS + 10)) batch_size=$BS batch_length=$BL \
    $SMALL \
    viclip_encode=False save_every_frames=500 steps_per_dispatch=5 \
    log_every_frames=200 workdir=$OUT/wm > runs/cpu_fallback_wm.log 2>&1
echo "wm rc=$? at $(date -u +%H:%M:%S); behavior" >> runs/cpu_fallback.status

timeout ${BEH_T:-10800} python -u train.py task=$TASK \
    agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r3b.mp4 \
    embed_whiten=True agent.imag_reward_args.align_initial=True \
    agent.imag_reward_args.align_sequence=False \
    batch_size=$BS batch_length=$BL num_train_frames=$((BEH_STEPS + 10)) \
    $SMALL \
    eval_modality=task_imag eval_every_frames=1000 num_eval_episodes=3 \
    snapshot_load_dir=$OUT/wm/$TASK/snapshots replay_load_dir=$EV/dataset_r3 \
    viclip_encode=False save_every_frames=500 steps_per_dispatch=5 \
    log_every_frames=200 workdir=$OUT/beh > runs/cpu_fallback_beh.log 2>&1
echo "beh rc=$? at $(date -u +%H:%M:%S); done" >> runs/cpu_fallback.status
