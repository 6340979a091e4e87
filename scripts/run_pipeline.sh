#!/bin/sh
# The full GenRL pipeline on one TPU chip — the commands behind
# evidence/pipeline/ (see evidence/pipeline/README.md for the results).
# Each stage resumes from its own snapshots, so re-running continues work.
set -ex

export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"
TASK=stickman_walk
EV=evidence/pipeline

# 1. online RL collection (DreamerV3, env reward): buffer + eval curve
python -u collect_data.py agent=dreamer task=$TASK \
    num_train_frames=250010 viclip_encode=False batch_size=16 \
    eval_every_frames=20000 num_eval_episodes=5 save_every_frames=10000 \
    workdir=$EV

# 2. dataset selection + InternVideo2 embedding pass
python - <<'EOF'
from pathlib import Path
import shutil
src, dst = Path('evidence/pipeline/stickman_walk/buffer'), Path('evidence/pipeline/dataset')
dst.mkdir(parents=True, exist_ok=True)
eps = sorted(src.glob('*.npz'), key=lambda p: int(p.stem.split('-')[0]))
for p in eps[:12] + eps[-52:]:
    if not (dst / p.name).exists():
        shutil.copy(p, dst / p.name)
EOF
python -u process_dataset.py dataset_dir=$EV/dataset

# 3. demonstration video prompt from the best collected window
python scripts/make_video_prompt.py $EV/stickman_walk/buffer \
    $EV/prompt_$TASK.mp4 64

# 4. world model + connector pretraining on the embedded dataset
python -u train.py task=$TASK train_world_model=True train_connector=True \
    replay_load_dir=$EV/dataset num_train_frames=150010 \
    batch_size=16 batch_length=16 viclip_encode=False \
    save_every_frames=10000 steps_per_dispatch=10 workdir=$EV/wm

# 5. behavior learning from the video prompt, imag-policy env evals
python -u train.py task=$TASK agent.imag_reward_fn=video_video_reward \
    task_video=$EV/prompt_$TASK.mp4 batch_size=32 batch_length=32 \
    num_train_frames=50010 eval_modality=task_imag eval_every_frames=10000 \
    num_eval_episodes=5 snapshot_load_dir=$EV/wm/$TASK/snapshots \
    replay_load_dir=$EV/dataset viclip_encode=False \
    save_every_frames=10000 steps_per_dispatch=10 workdir=$EV/beh

# curves
python scripts/plot_evidence.py $EV/stickman_walk
python scripts/plot_evidence.py $EV/wm/$TASK
python scripts/plot_evidence.py $EV/beh/$TASK
