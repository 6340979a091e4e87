#!/bin/sh
# Round-4b headline-evidence chain: runs AFTER a fresh online collection
# (runs/collect_r4) reaches task-competent data. The round-4a chain
# (auto_chain_r4.sh) proved the mechanics but trained against a 64-episode
# early-training dataset whose best 64-step window was 0.14 normalized —
# no behavior run on that data could clear the 0.2 bar — and its diag
# (evidence/pipeline/beh_r4/.../diag/results.json) showed connector-target
# reward hacking. This chain re-runs the back half on competent data with
# the round-4 fixes: target_from=posterior demo targets (+ the connector
# route with score_clip as a secondary stage if time permits).
#
# Stages (single-client TPU -> strictly sequential):
#   A. video prompt (mp4 + obs/action npz) from the best collected window
#   B. stratified 32-episode dataset + InternVideo2 embedding pass
#   C. WM + connector pretraining at reference 48x48 from scratch on the
#      embedded dataset (the collector's Dreamer WM is deter-512/feat and
#      cannot seed the genrl-preset WM; see load_wm_subtree docstring)
#   D. behavior from the demonstration prompt, posterior targets, dense evals
#   E. (optional, TIME permitting) behavior via the honest connector route
#      with score_clip at the measured real-window ceiling
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
TASK=stickman_walk
EV=evidence/pipeline
BUF=runs/collect_r4/$TASK/buffer
ST=runs/auto_r4b.status

echo "chain start $(date -u +%H:%M:%S)" > $ST

# A. demonstration prompt from the best collected 64-step window
python scripts/make_video_prompt.py $BUF $EV/prompt_r4b.mp4 64
echo "prompt rc=$? at $(date -u +%H:%M:%S)" >> $ST

# B. dataset selection + embedding (~48 eps x ~493 windows / 16 clips/s ~ 25 min)
python scripts/select_episodes.py $BUF $EV/dataset_r4b 48 32
timeout ${EMB_T:-3000} python -u process_dataset.py dataset_dir=$EV/dataset_r4b \
    > runs/embed_r4b.log 2>&1
echo "embed rc=$? at $(date -u +%H:%M:%S) files=$(ls $EV/dataset_r4b | wc -l)" >> $ST

# C. WM + connector at reference pretrain batch 48x48 (~60k steps at the
# measured 31 steps/s ~ 33 min + ~13 min first dispatch)
timeout ${WM_T:-5400} python -u train.py task=$TASK train_world_model=True \
    train_connector=True replay_load_dir=$EV/dataset_r4b embed_whiten=True \
    num_train_frames=${WM_STEPS:-60010} batch_size=48 batch_length=48 \
    viclip_encode=False save_every_frames=5000 steps_per_dispatch=8 \
    workdir=$EV/wm_r4b > runs/wm_r4b.log 2>&1
echo "wm rc=$? at $(date -u +%H:%M:%S) step=$(tail -1 $EV/wm_r4b/$TASK/train.csv | cut -d, -f7)" >> $ST

# D. behavior from the demonstration: posterior targets (exact by
# construction — not bounded by CLIP-checkpoint fidelity), align_initial,
# env evals every 2000 frames so rows land early and often
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

# E. (optional) connector-route behavior with the anti-hacking ceiling
if [ -n "$RUN_CONNECTOR_STAGE" ]; then
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
fi
echo "chain done $(date -u +%H:%M:%S)" >> $ST
