#!/bin/sh
# Auto-resume the round-3 pipeline when the TPU tunnel returns (v2).
# Supersedes auto_resume_r3.sh: the session restart reset the wall-clock
# budget, so the dataset grows to 310 episodes (~155k frames) before the
# WM48 stage, budgets go back to near-reference scale, and the behavior
# stage uses the regenerated high-reward prompt (prompt_r3b.mp4).
# Ordering: bench.py first (driver-artifact sanity in ~10 min), then
# embed -> WM48 -> behavior (the headline chain), then perf + finetune.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
TASK=stickman_walk
EV=evidence/pipeline

echo "waiting for TPU relay on :8082..." > runs/auto_resume.status
while ! ss -tln 2>/dev/null | grep -q ':8082 '; do
    sleep 45
done
echo "relay back at $(date -u +%H:%M:%S); probing jax..." >> runs/auto_resume.status
until timeout 300 python -u -c "import jax; print(jax.devices())" \
      >> runs/auto_resume.status 2>&1; do
    sleep 60
done
echo "TPU live at $(date -u +%H:%M:%S); bench.py first" >> runs/auto_resume.status

# hard stop: the fourth round-3 session runs until ~19:55 UTC 2026-08-18;
# stop the headline chain at 18:15 so bench_all + finetune land by ~19:30,
# leaving the single-client TPU free before the driver's end-of-round bench
DEADLINE=$(date -u -d "2026-08-18 18:15" +%s 2>/dev/null || echo 0)

# 0. driver artifact sanity: bench.py was refactored onto fused_chunk this
# round — make sure the driver's end-of-round invocation cannot crash
timeout 1800 python -u bench.py > runs/bench_r3.log 2>&1
echo "bench rc=$? at $(date -u +%H:%M:%S); embedding dataset" >> runs/auto_resume.status

# 1. embed the ~147 not-yet-embedded episodes (310 total selected; the
# embedder skips episodes that already carry clip_video)
# 147 pending x ~50 s/episode ≈ 2h; 3h cap so a slow tunnel can't truncate.
# Late-relay clamp: never let embedding eat the WM/behavior shares — if the
# relay came back late, cap embed so >=2.5h remain before DEADLINE (the 163
# already-embedded episodes make a partial embed lossless for the chain).
EMBED_T=10800
EMB_ROOM=$(( DEADLINE - $(date +%s) - 9000 ))
[ $EMB_ROOM -lt 1200 ] && EMB_ROOM=1200
[ $EMBED_T -gt $EMB_ROOM ] && EMBED_T=$EMB_ROOM
timeout $EMBED_T python -u process_dataset.py dataset_dir=$EV/dataset_r3 \
    batch_windows=128 > runs/embed_r3d.log 2>&1
echo "embed rc=$? at $(date -u +%H:%M:%S); starting WM48" >> runs/auto_resume.status

# adaptive budgets, computed AFTER the embed stage so its (up to 2.5h) cost
# doesn't eat the WM/behavior shares: reserve ~75 min for bench_all+finetune,
# then split the rest WM 55% / behavior 45%; snapshots every 5000 steps make
# an early timeout lossless — the next stage starts from the last snapshot
NOW=$(date +%s)
REM=$(( DEADLINE - NOW - 4500 ))
# deadline already blown (relay returned very late): run a minimal chain
# (the per-stage floors below give WM 30 min + behavior 60 min), not 4h
[ "$REM" -gt 0 ] || REM=0
WM_T=$(( REM * 55 / 100 )); [ $WM_T -gt 16200 ] && WM_T=16200; [ $WM_T -lt 1800 ] && WM_T=1800
BEH_T=$(( REM * 45 / 100 )); [ $BEH_T -gt 12600 ] && BEH_T=12600; [ $BEH_T -lt 3600 ] && BEH_T=3600
echo "budgets: remaining=${REM}s wm=${WM_T}s beh=${BEH_T}s" >> runs/auto_resume.status

# 2. world model + connector at reference pretrain batch (48x48), 160k steps
timeout $WM_T python -u train.py task=$TASK train_world_model=True \
    train_connector=True replay_load_dir=$EV/dataset_r3 embed_whiten=True \
    num_train_frames=160010 batch_size=48 batch_length=48 viclip_encode=False \
    save_every_frames=5000 steps_per_dispatch=8 workdir=$EV/wm48 \
    > runs/wm48_r3.log 2>&1
echo "WM48 rc=$? at $(date -u +%H:%M:%S)" >> runs/auto_resume.status

# 2f. 48x48 has never run on the real chip; if it died before the first
# snapshot (e.g. HBM OOM) fall back to 32x32 in the same workdir
if [ ! -e "$EV/wm48/$TASK/snapshots/last_snapshot" ]; then
    echo "WM48 left no snapshot; falling back to 32x32" >> runs/auto_resume.status
    timeout $WM_T python -u train.py task=$TASK train_world_model=True \
        train_connector=True replay_load_dir=$EV/dataset_r3 embed_whiten=True \
        num_train_frames=160010 batch_size=32 batch_length=32 viclip_encode=False \
        save_every_frames=5000 steps_per_dispatch=8 workdir=$EV/wm48 \
        >> runs/wm48_r3.log 2>&1
    echo "WM32 fallback rc=$? at $(date -u +%H:%M:%S)" >> runs/auto_resume.status
fi

# 2d. alignment diagnosis against the fresh WM/connector (CPU-only script,
# runs beside the TPU behavior stage)
nohup sh -c "JAX_PLATFORMS=cpu python -u scripts/diagnose_alignment.py \
    --wm $EV/wm48/$TASK --dataset $EV/dataset_r3 --video $EV/prompt_r3b.mp4 \
    --out evidence/diag_alignment_r3" > runs/diag_r3.log 2>&1 &

# 3. behavior learning from the regenerated high-reward video prompt
echo "starting behavior at $(date -u +%H:%M:%S)" >> runs/auto_resume.status
timeout $BEH_T python -u train.py task=$TASK \
    agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r3b.mp4 \
    embed_whiten=True agent.imag_reward_args.align_initial=True \
    agent.imag_reward_args.align_sequence=False \
    batch_size=32 batch_length=32 num_train_frames=80010 \
    eval_modality=task_imag eval_every_frames=10000 num_eval_episodes=5 \
    snapshot_load_dir=$EV/wm48/$TASK/snapshots replay_load_dir=$EV/dataset_r3 \
    viclip_encode=False save_every_frames=5000 steps_per_dispatch=10 \
    workdir=$EV/beh_r3 > runs/beh_r3.log 2>&1
echo "behavior rc=$? at $(date -u +%H:%M:%S); bench_all" >> runs/auto_resume.status

# 4/5 run only if their reserved window (DEADLINE..DEADLINE+75min) is open
if [ $(date +%s) -lt $(( DEADLINE + 4500 )) ]; then
# 4. refresh the full perf table (incl. the new 48x48 config)
timeout 3600 python -u scripts/bench_all.py > runs/bench_all_r3.log 2>&1
echo "bench_all rc=$? at $(date -u +%H:%M:%S); finetune" >> runs/auto_resume.status

# 5. finetune evidence (reference train_mode=finetune): start from the
# prompt-learned behavior agent when it exists — the reference recipe
# finetunes the pretrained agent's imag behavior on env reward
FT_SNAP=$EV/beh_r3/$TASK/snapshots
[ -e "$FT_SNAP/last_snapshot" ] || FT_SNAP=$EV/wm48/$TASK/snapshots
timeout 3600 python -u train.py task=$TASK finetune=True \
    snapshot_load_dir=$FT_SNAP replay_load_dir=$EV/dataset_r3 \
    embed_whiten=True batch_size=16 batch_length=16 num_train_frames=20010 \
    eval_modality=task_imag eval_every_frames=10000 num_eval_episodes=5 \
    viclip_encode=False save_every_frames=10000 steps_per_dispatch=10 \
    workdir=$EV/finetune_r3 > runs/finetune_r3.log 2>&1
echo "finetune rc=$? at $(date -u +%H:%M:%S); all stages complete" >> runs/auto_resume.status
else
    echo "deadline passed; skipping bench_all/finetune" >> runs/auto_resume.status
fi
