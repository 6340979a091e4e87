#!/bin/sh
# Post-chain round-4b stages: runs AFTER scripts/auto_chain_r4b.sh exits
# (single-client TPU -> must wait for the chain pid). Two legs:
#   E. connector-route behavior (the reference's actual prompt mechanism,
#      conf/train_mode/train_behavior.yaml) with the anti-hacking score_clip
#      at the measured real-window ceiling — complements stage D's
#      posterior-target route with the honest CLIP+connector path.
#   F. finetune from the best behavior snapshot (reference
#      agent/genrl.py:55-59, conf/train_mode/finetune.yaml) — VERDICT r3
#      item 5 re-run on competent data (the r4a run scored at floor because
#      its behavior snapshot was trained on early-training junk data).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
TASK=stickman_walk
EV=evidence/pipeline
ST=runs/post_r4b.status

# wait for the main chain to finish (its status file ends with "chain done";
# poll that rather than a pid — /tmp/chain.pid points at a wrapper shell)
while ! grep -q "chain done" runs/auto_r4b.status 2>/dev/null; do sleep 30; done
echo "post-chain start $(date -u +%H:%M:%S)" > $ST

# E. connector-route behavior (skip if the WM stage left no snapshot)
if [ -d $EV/wm_r4b/$TASK/snapshots ]; then
timeout ${BEHC_T:-5400} python -u train.py task=$TASK \
    agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r4b.mp4 \
    agent.imag_reward_args.align_initial=True \
    agent.imag_reward_args.align_sequence=False \
    agent.imag_reward_args.score_clip=${SCORE_CLIP:-0.12} \
    embed_whiten=True batch_size=32 batch_length=32 \
    num_train_frames=${BEHC_STEPS:-25010} \
    eval_modality=task_imag eval_every_frames=2000 num_eval_episodes=3 \
    snapshot_load_dir=$EV/wm_r4b/$TASK/snapshots replay_load_dir=$EV/dataset_r4b \
    viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
    workdir=$EV/beh_conn_r4 > runs/beh_conn_r4.log 2>&1 &
BPID=$!; echo $BPID > /tmp/post_stage.pid; wait $BPID
echo "beh_conn rc=$? at $(date -u +%H:%M:%S) evals=$(wc -l < $EV/beh_conn_r4/$TASK/eval.csv 2>/dev/null)" >> $ST
else
echo "beh_conn SKIPPED: no wm snapshots" >> $ST
fi

# F. finetune from the posterior-route behavior snapshot
if [ -d $EV/beh_post_r4/$TASK/snapshots ]; then
timeout ${FT_T:-5400} python -u train.py task=$TASK finetune=True \
    embed_whiten=True batch_size=32 batch_length=32 \
    num_train_frames=${FT_STEPS:-25010} \
    eval_modality=task_imag eval_every_frames=2000 num_eval_episodes=3 \
    snapshot_load_dir=$EV/beh_post_r4/$TASK/snapshots replay_load_dir=$EV/dataset_r4b \
    viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
    workdir=$EV/finetune_r4b > runs/finetune_r4b.log 2>&1 &
FPID=$!; echo $FPID > /tmp/post_stage.pid; wait $FPID
echo "finetune rc=$? at $(date -u +%H:%M:%S) evals=$(wc -l < $EV/finetune_r4b/$TASK/eval.csv 2>/dev/null)" >> $ST
else
echo "finetune SKIPPED: no behavior snapshots" >> $ST
fi
echo "post-chain done $(date -u +%H:%M:%S)" >> $ST
