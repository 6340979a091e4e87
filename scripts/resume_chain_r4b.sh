#!/bin/sh
# Resume of auto_chain_r4b.sh after the _demo_window config-key fix
# (train.py: imag_horizon is a root key). Stages A-C already succeeded
# (prompt_r4b, dataset_r4b embedded, wm_r4b at 60k steps); this reruns
# D (posterior-target behavior) and E (connector route w/ score_clip).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
TASK=stickman_walk
EV=evidence/pipeline
ST=runs/auto_r4b.status

echo "resume start $(date -u +%H:%M:%S)" >> $ST

# D. behavior from the demonstration: posterior targets, dense evals
timeout ${BEH_T:-7200} python -u train.py task=$TASK \
    agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r4b.mp4 \
    agent.imag_reward_args.target_from=posterior \
    agent.imag_reward_args.align_initial=True \
    agent.imag_reward_args.align_sequence=False \
    embed_whiten=True batch_size=32 batch_length=32 \
    num_train_frames=${BEH_STEPS:-25010} \
    eval_modality=task_imag eval_every_frames=2000 num_eval_episodes=3 \
    snapshot_load_dir=$EV/wm_r4b/$TASK/snapshots replay_load_dir=$EV/dataset_r4b \
    viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
    workdir=$EV/beh_post_r4 > runs/beh_post_r4.log 2>&1
echo "beh_post rc=$? at $(date -u +%H:%M:%S) evals=$(wc -l < $EV/beh_post_r4/$TASK/eval.csv 2>/dev/null)" >> $ST

# E. connector-route behavior with the anti-hacking ceiling
timeout ${BEHC_T:-7200} python -u train.py task=$TASK \
    agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r4b.mp4 \
    agent.imag_reward_args.align_initial=True \
    agent.imag_reward_args.align_sequence=False \
    agent.imag_reward_args.score_clip=${SCORE_CLIP:-0.12} \
    embed_whiten=True batch_size=32 batch_length=32 \
    num_train_frames=${BEHC_STEPS:-25010} \
    eval_modality=task_imag eval_every_frames=2000 num_eval_episodes=3 \
    snapshot_load_dir=$EV/wm_r4b/$TASK/snapshots replay_load_dir=$EV/dataset_r4b \
    viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
    workdir=$EV/beh_conn_r4 > runs/beh_conn_r4.log 2>&1
echo "beh_conn rc=$? at $(date -u +%H:%M:%S) evals=$(wc -l < $EV/beh_conn_r4/$TASK/eval.csv 2>/dev/null)" >> $ST
echo "resume done $(date -u +%H:%M:%S)" >> $ST
