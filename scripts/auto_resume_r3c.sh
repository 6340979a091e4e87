#!/bin/sh
# Round-3 headline chain, re-armed after the VM reset (v3).
# The reset wiped everything untracked: the 562-episode collection buffer,
# dataset_r3 (310 eps, 163 embedded), and the wm48 snapshots. What survived
# in git: the 64-episode embedded dataset (evidence/pipeline/dataset), the
# collection learning curves (normalized_score 0.55), and prompt_r3b.mp4.
# This runner therefore skips collection+embedding and runs the r3 recipe
# (embed whitening + align_initial + high-reward video prompt) directly on
# the surviving dataset: WM+connector at reference batch 48x48, then
# video-prompt behavior. Snapshots every 2500 steps make any timeout
# lossless; stages resume from last_snapshot if re-run.
# Caller is expected to have bench.py already running/finished; we wait for
# its JSON line so the single-client TPU is never contended.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
TASK=stickman_walk
EV=evidence/pipeline
ST=runs/auto_r3c.status

echo "chain start $(date -u +%H:%M:%S)" > $ST

# 0. wait (max 15 min) for the already-running bench.py to release the TPU
i=0
while [ $i -lt 60 ]; do
    grep -q '"metric"' runs/bench_r3.log 2>/dev/null && break
    sleep 15; i=$((i+1))
done
echo "bench done at $(date -u +%H:%M:%S): $(tail -1 runs/bench_r3.log 2>/dev/null | cut -c1-160)" >> $ST

# 1. WM + connector at reference pretrain batch (48x48), whitened embeds
timeout ${WM_T:-1500} python -u train.py task=$TASK train_world_model=True \
    train_connector=True replay_load_dir=$EV/dataset embed_whiten=True \
    num_train_frames=160010 batch_size=48 batch_length=48 viclip_encode=False \
    save_every_frames=2500 steps_per_dispatch=8 workdir=$EV/wm48 \
    > runs/wm48_r3.log 2>&1
echo "WM48 rc=$? at $(date -u +%H:%M:%S)" >> $ST

# 1f. 48x48 has never run on this chip; if it died before the first
# snapshot (e.g. HBM OOM) fall back to 32x32 in the same workdir
if [ ! -e "$EV/wm48/$TASK/snapshots/last_snapshot" ]; then
    echo "WM48 left no snapshot; falling back to 32x32" >> $ST
    timeout ${WM_T:-1500} python -u train.py task=$TASK train_world_model=True \
        train_connector=True replay_load_dir=$EV/dataset embed_whiten=True \
        num_train_frames=160010 batch_size=32 batch_length=32 viclip_encode=False \
        save_every_frames=2500 steps_per_dispatch=8 workdir=$EV/wm48 \
        >> runs/wm48_r3.log 2>&1
    echo "WM32 fallback rc=$? at $(date -u +%H:%M:%S)" >> $ST
fi

# 2. behavior learning from the high-reward video prompt (r3 recipe:
# align_initial — the best return-correlation variant in diag_alignment —
# whitened consistently with the pretrain stats saved next to the snapshot)
echo "starting behavior at $(date -u +%H:%M:%S)" >> $ST
timeout ${BEH_T:-1500} python -u train.py task=$TASK \
    agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r3b.mp4 \
    embed_whiten=True agent.imag_reward_args.align_initial=True \
    agent.imag_reward_args.align_sequence=False \
    batch_size=32 batch_length=32 num_train_frames=80010 \
    eval_modality=task_imag eval_every_frames=5000 num_eval_episodes=5 \
    snapshot_load_dir=$EV/wm48/$TASK/snapshots replay_load_dir=$EV/dataset \
    viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
    workdir=$EV/beh_r3 > runs/beh_r3.log 2>&1
echo "behavior rc=$? at $(date -u +%H:%M:%S); chain done" >> $ST
