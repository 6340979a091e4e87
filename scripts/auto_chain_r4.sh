#!/bin/sh
# Round-4 headline-evidence chain (VERDICT r3 items 1, 2, 5).
# Budgets are compile-aware this time: round 3's stages died at `timeout
# 1200` against a ~13-min first dispatch (runs/wm48_r3.log). Per-stage
# timeouts are now >= 5400 s, the compilation cache is pinned, and every
# stage snapshots every 2500 steps so a timeout is lossless (re-running the
# same stage resumes from last_snapshot).
#
# Stages (single-client TPU -> strictly sequential):
#   1. wm48    : resume WM+connector pretraining at reference batch 48x48
#                (evidence/pipeline/wm48, currently at 5k) to 160k steps.
#   2. beh_r4  : FRESH behavior run from the finished wm48 snapshot
#                (round 3's beh_r3 trained against the 5k-step WM; a policy
#                continued from it would be inconsistent), video prompt +
#                align_initial + whitening, env evals every 2500 frames so
#                eval rows land early and often.
#   3. finetune_r4 : reference train_mode=finetune from the behavior
#                snapshot (agent/genrl.py:55-59) — imag behavior acts,
#                reward head joins grad_heads, env-reward in imagination.
#   4. bench_all : regenerate one coherent BENCH_ALL.json (all configs incl
#                3b) so no two perf artifacts disagree (VERDICT weak #1).
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
TASK=stickman_walk
EV=evidence/pipeline
ST=runs/auto_r4.status

echo "chain start $(date -u +%H:%M:%S)" > $ST

# 1. WM + connector, resume 5k -> 160k (approx 85 min at the measured
# 30.45 steps/s + snapshot I/O; give it 3h)
timeout ${WM_T:-10800} python -u train.py task=$TASK train_world_model=True \
    train_connector=True replay_load_dir=$EV/dataset embed_whiten=True \
    num_train_frames=160010 batch_size=48 batch_length=48 viclip_encode=False \
    save_every_frames=2500 steps_per_dispatch=8 workdir=$EV/wm48 \
    > runs/wm48_r4.log 2>&1
echo "WM48 rc=$? at $(date -u +%H:%M:%S) step=$(tail -1 $EV/wm48/$TASK/train.csv | cut -d, -f7)" >> $ST

# 2. behavior from the high-reward video prompt, fresh workdir, dense evals
timeout ${BEH_T:-9000} python -u train.py task=$TASK \
    agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r3b.mp4 \
    embed_whiten=True agent.imag_reward_args.align_initial=True \
    agent.imag_reward_args.align_sequence=False \
    batch_size=32 batch_length=32 num_train_frames=50010 \
    eval_modality=task_imag eval_every_frames=2500 num_eval_episodes=5 \
    snapshot_load_dir=$EV/wm48/$TASK/snapshots replay_load_dir=$EV/dataset \
    viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
    workdir=$EV/beh_r4 > runs/beh_r4.log 2>&1
echo "behavior rc=$? at $(date -u +%H:%M:%S) evals=$(wc -l < $EV/beh_r4/$TASK/eval.csv 2>/dev/null)" >> $ST

# 3. finetune from the behavior snapshot (env reward drives the imag
# behavior; connector frozen, reward head trained)
timeout ${FT_T:-7200} python -u train.py task=$TASK finetune=True \
    embed_whiten=True batch_size=32 batch_length=32 num_train_frames=30010 \
    eval_modality=task_imag eval_every_frames=2500 num_eval_episodes=5 \
    snapshot_load_dir=$EV/beh_r4/$TASK/snapshots replay_load_dir=$EV/dataset \
    viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
    workdir=$EV/finetune_r4 > runs/finetune_r4.log 2>&1
echo "finetune rc=$? at $(date -u +%H:%M:%S) evals=$(wc -l < $EV/finetune_r4/$TASK/eval.csv 2>/dev/null)" >> $ST

# 4. one coherent perf table (fresh BENCH_ALL.json, all configs incl 3b)
timeout ${BENCH_T:-7200} python -u scripts/bench_all.py > runs/bench_all_r4.log 2>&1
echo "bench_all rc=$? at $(date -u +%H:%M:%S); chain done" >> $ST
