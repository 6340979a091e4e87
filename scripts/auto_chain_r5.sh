#!/bin/sh
# Round-5 headline chain: close the prompt->behavior transfer gap (VERDICT r4
# item 1) with the r5 fix list, and make every stage RESET-PROOF (item 2) —
# two VM resets wiped untracked artifacts in rounds 3/4, so each stage ends
# with a forced git commit of its outputs, and every stage has a resume guard
# so this script can be re-run from any wipe using only tracked artifacts.
#
# Stages (single-client TPU -> strictly sequential):
#   A. wait for the online collection (launched separately; resumes itself
#      from committed snapshots + buffer if interrupted)
#   B. demonstration prompt (mp4 + obs/action npz) from the best window
#   C. stratified 48-episode dataset + InternVideo2 embedding pass
#   D. WM + connector pretraining, 48x48, embed_whiten
#   E. MEASURE the reward config: spearman(reward, env return) + real-window
#      ceiling per candidate config in posterior space (r5 fix: r4b ran the
#      known-bad combination align_initial/no-clip because nothing measured
#      the posterior space) -> best config + score_clip for stage F
#   F. behavior from the demo prompt, posterior targets, measured config
#   F2. hacking diagnosis + decoded panels on the trained behavior
#   G. connector-route behavior (the reference's actual prompt mechanism)
#   H. finetune from the behavior snapshot
#   I. Plan2Explore demonstration collection (VERDICT item 7)
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
TASK=stickman_walk
EV=evidence/pipeline
COL=$EV/collect_r5
BUF=$COL/$TASK/buffer
DS=$EV/dataset_r5
ST=runs/auto_r5.status

ckpt() {  # ckpt <msg> <paths...> — force-commit stage artifacts (reset-proof)
    msg="$1"; shift
    # one add per path: `git add A B` aborts ENTIRELY when any pathspec
    # doesn't exist, which silently skipped checkpoints
    for p in "$@" runs/*.log runs/*.status; do
        [ -e "$p" ] && git add -f "$p" 2>/dev/null
    done
    git commit -q -m "r5 chain: $msg" >/dev/null 2>&1 || true
}

echo "chain start $(date -u +%H:%M:%S)" > $ST

# A. wait for collection (its own process; watcher commits it periodically)
while [ -f /tmp/collect_r5.pid ] && kill -0 "$(cat /tmp/collect_r5.pid)" 2>/dev/null; do
    sleep 60
done
echo "collect done at $(date -u +%H:%M:%S) eps=$(ls $BUF 2>/dev/null | wc -l)" >> $ST
ckpt "collection final ($(ls $BUF 2>/dev/null | wc -l) episodes)" $COL

# B. demonstration prompt from the best collected 64-step window
if [ ! -f $EV/prompt_r5.npz ]; then
    python scripts/make_video_prompt.py $BUF $EV/prompt_r5.mp4 64
    echo "prompt rc=$? at $(date -u +%H:%M:%S)" >> $ST
    ckpt "demonstration prompt" $EV/prompt_r5.mp4 $EV/prompt_r5.npz
fi

# C. dataset selection + embedding
if [ ! -f $DS/.embedded ]; then
    [ -d $DS ] || python scripts/select_episodes.py $BUF $DS 48 32
    timeout ${EMB_T:-3600} python -u process_dataset.py dataset_dir=$DS \
        > runs/embed_r5.log 2>&1 && touch $DS/.embedded
    echo "embed rc=$? at $(date -u +%H:%M:%S) files=$(ls $DS | wc -l)" >> $ST
    ckpt "embedded 48-episode dataset" $DS
fi

# D. WM + connector at reference pretrain batch 48x48 (auto-resumes from its
# own committed snapshots after a wipe)
WM_STEPS=${WM_STEPS:-60010}
wm_step() { tail -1 $EV/wm_r5/$TASK/train.csv 2>/dev/null | cut -d, -f7 | cut -d. -f1; }
if [ "$(wm_step)" -lt $((WM_STEPS - 20)) ] 2>/dev/null || [ ! -f $EV/wm_r5/$TASK/train.csv ]; then
    timeout ${WM_T:-5400} python -u train.py task=$TASK train_world_model=True \
        train_connector=True replay_load_dir=$DS embed_whiten=True \
        num_train_frames=$WM_STEPS batch_size=48 batch_length=48 \
        viclip_encode=False save_every_frames=2500 steps_per_dispatch=8 \
        workdir=$EV/wm_r5 > runs/wm_r5.log 2>&1
    echo "wm rc=$? at $(date -u +%H:%M:%S) step=$(wm_step)" >> $ST
    ckpt "WM+connector pretrained to step $(wm_step)" $EV/wm_r5
fi

# E. measure the reward config in posterior space -> best args + score_clip
if [ ! -f $EV/wm_r5/$TASK/diag_reward.json ]; then
    timeout 2400 python -u scripts/diag_posterior_reward.py \
        $EV/wm_r5/$TASK $DS $EV/prompt_r5.npz $EV/wm_r5/$TASK/diag_reward.json \
        > runs/diag_reward_r5.log 2>&1
    echo "diag rc=$? at $(date -u +%H:%M:%S)" >> $ST
    ckpt "posterior reward-config measurement" $EV/wm_r5/$TASK/diag_reward.json
fi
eval "$(python -c "
import json
d = json.load(open('$EV/wm_r5/$TASK/diag_reward.json'))
a = d['best_args']
print(f'R_INIT={a[\"align_initial\"]} R_SEQ={a[\"align_sequence\"]}')
print(f'R_FN={a[\"score_fn\"]} R_CLIP={d[\"score_clip\"]:.6f}')
print(f'R_FROM={a.get(\"score_from\", \"sample\")}')
")"
if [ -z "$R_FN" ] || [ -z "$R_CLIP" ]; then
    echo "ABORT: stage-E reward measurement missing or unparseable" >> $ST
    ckpt "chain aborted: no measured reward config" runs/auto_r5.status
    exit 1
fi
echo "measured config: init=$R_INIT seq=$R_SEQ fn=$R_FN from=$R_FROM clip=$R_CLIP" >> $ST

# F. behavior from the demonstration: posterior targets + measured config
beh_evals() { wc -l < $EV/beh_post_r5/$TASK/eval.csv 2>/dev/null || echo 0; }
if [ "$(beh_evals)" -lt 10 ]; then
    timeout ${BEH_T:-7200} python -u train.py task=$TASK \
        agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r5.mp4 \
        agent.imag_reward_args.target_from=posterior \
        agent.imag_reward_args.align_initial=$R_INIT \
        agent.imag_reward_args.align_sequence=$R_SEQ \
        agent.imag_reward_args.score_fn=$R_FN \
        agent.imag_reward_args.score_from=$R_FROM \
        agent.imag_reward_args.score_clip=$R_CLIP \
        embed_whiten=True batch_size=32 batch_length=32 \
        num_train_frames=${BEH_STEPS:-30010} \
        eval_modality=task_imag eval_every_frames=2000 num_eval_episodes=3 \
        snapshot_load_dir=$EV/wm_r5/$TASK/snapshots replay_load_dir=$DS \
        viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
        workdir=$EV/beh_post_r5 > runs/beh_post_r5.log 2>&1
    echo "beh_post rc=$? at $(date -u +%H:%M:%S) evals=$(beh_evals)" >> $ST
    ckpt "posterior-route behavior ($(beh_evals) evals)" $EV/beh_post_r5
fi

# F2. hacking diagnosis + decoded panels (VERDICT r4 item 4: the decoded-
# target sanity panel must land in evidence)
if [ ! -f $EV/beh_post_r5/$TASK/diag/results.json ]; then
    timeout 2400 python -u scripts/diag_behavior.py $EV/beh_post_r5/$TASK $DS \
        > runs/diag_beh_r5.log 2>&1
    ckpt "behavior hacking diagnosis + panels" $EV/beh_post_r5/$TASK/diag
fi

# G. connector-route behavior (the reference's actual prompt mechanism);
# same measured config — connector targets live in the same latent space
if [ "${RUN_CONNECTOR:-1}" = 1 ] && [ ! -f $EV/beh_conn_r5/$TASK/eval.csv ]; then
    timeout ${BEHC_T:-5400} python -u train.py task=$TASK \
        agent.imag_reward_fn=video_video_reward task_video=$EV/prompt_r5.mp4 \
        agent.imag_reward_args.align_initial=$R_INIT \
        agent.imag_reward_args.align_sequence=$R_SEQ \
        agent.imag_reward_args.score_fn=$R_FN \
        agent.imag_reward_args.score_from=$R_FROM \
        agent.imag_reward_args.score_clip=$R_CLIP \
        embed_whiten=True batch_size=32 batch_length=32 \
        num_train_frames=${BEHC_STEPS:-25010} \
        eval_modality=task_imag eval_every_frames=2000 num_eval_episodes=3 \
        snapshot_load_dir=$EV/wm_r5/$TASK/snapshots replay_load_dir=$DS \
        viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
        workdir=$EV/beh_conn_r5 > runs/beh_conn_r5.log 2>&1
    echo "beh_conn rc=$? at $(date -u +%H:%M:%S)" >> $ST
    ckpt "connector-route behavior" $EV/beh_conn_r5
fi

# H. finetune from the posterior-route behavior snapshot
if [ "${RUN_FINETUNE:-1}" = 1 ] && [ -d $EV/beh_post_r5/$TASK/snapshots ] \
        && [ ! -f $EV/finetune_r5/$TASK/eval.csv ]; then
    timeout ${FT_T:-5400} python -u train.py task=$TASK finetune=True \
        embed_whiten=True batch_size=32 batch_length=32 \
        num_train_frames=${FT_STEPS:-25010} \
        eval_modality=task_imag eval_every_frames=2000 num_eval_episodes=3 \
        snapshot_load_dir=$EV/beh_post_r5/$TASK/snapshots replay_load_dir=$DS \
        viclip_encode=False save_every_frames=2500 steps_per_dispatch=10 \
        workdir=$EV/finetune_r5 > runs/finetune_r5.log 2>&1
    echo "finetune rc=$? at $(date -u +%H:%M:%S)" >> $ST
    ckpt "finetune from behavior snapshot" $EV/finetune_r5
fi

# I. Plan2Explore demonstration collection (VERDICT r4 item 7): intrinsic
# disagreement reward + episode diversity at reduced scale
if [ "${RUN_P2E:-1}" = 1 ] && [ ! -f evidence/p2e/$TASK/train.csv ]; then
    timeout ${P2E_T:-3600} python -u collect_data.py agent=plan2explore \
        task=$TASK workdir=evidence/p2e num_collect_envs=8 \
        train_every_actions=4 num_train_frames=${P2E_STEPS:-12010} \
        num_seed_frames=2000 eval_every_frames=1000000 \
        log_every_frames=500 snapshot_every_frames=100000 \
        > runs/p2e_r5.log 2>&1
    echo "p2e rc=$? at $(date -u +%H:%M:%S)" >> $ST
    ckpt "Plan2Explore demonstration collection" evidence/p2e
fi

echo "chain done $(date -u +%H:%M:%S)" >> $ST
ckpt "chain complete" runs/auto_r5.status
