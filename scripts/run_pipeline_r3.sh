#!/bin/sh
# Round-3 pipeline: prompt -> behavior transfer at (near-)reference scale.
# Stages after the online collection run (see run_pipeline.sh stage 1; round 3
# runs it with num_collect_envs=8 to ~300k frames).
#
# Deltas vs run_pipeline.sh (the round-2 evidence):
#   * ~3x the data, recency-stratified (select_episodes.py)
#   * embed_whiten=True everywhere: random-init InternVideo2 embeddings are
#     collapsed (pairwise cosine ~.996); whitening recovers the behavior-
#     discriminative residual (evidence/diag_alignment/results.json)
#   * WM+connector at the reference's 48x48 pretrain batch
#     (conf/defaults/genrl.yaml:30-31), 200k steps
#   * behavior reward uses align_initial (best return correlation in the
#     alignment diagnosis: spearman .47 vs .36 for align_sequence)
set -ex

export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"
TASK=stickman_walk
EV=evidence/pipeline

# 2. stratified dataset selection + InternVideo2 embedding pass
python scripts/select_episodes.py $EV/$TASK/buffer $EV/dataset_r3 180
python -u process_dataset.py dataset_dir=$EV/dataset_r3 batch_windows=128

# 3. demonstration video prompt from the best collected window
python scripts/make_video_prompt.py $EV/$TASK/buffer $EV/prompt_r3.mp4 64

# 4. world model + connector at reference pretrain scale (48x48)
python -u train.py task=$TASK train_world_model=True train_connector=True \
    replay_load_dir=$EV/dataset_r3 embed_whiten=True num_train_frames=200010 \
    batch_size=48 batch_length=48 viclip_encode=False \
    save_every_frames=10000 steps_per_dispatch=8 workdir=$EV/wm48

# 5. behavior learning from the video prompt, imag-policy env evals
python -u train.py task=$TASK agent.imag_reward_fn=video_video_reward \
    task_video=$EV/prompt_r3.mp4 embed_whiten=True \
    agent.imag_reward_args.align_initial=True \
    agent.imag_reward_args.align_sequence=False \
    batch_size=32 batch_length=32 num_train_frames=100010 \
    eval_modality=task_imag eval_every_frames=5000 num_eval_episodes=5 \
    snapshot_load_dir=$EV/wm48/$TASK/snapshots replay_load_dir=$EV/dataset_r3 \
    viclip_encode=False save_every_frames=10000 steps_per_dispatch=10 \
    workdir=$EV/beh_r3

python scripts/plot_evidence.py $EV/wm48/$TASK
python scripts/plot_evidence.py $EV/beh_r3/$TASK
