#!/bin/sh
# Reset-proof artifact watcher (VERDICT r4 item 2): two VM resets wiped every
# untracked artifact (buffers, datasets, orbax snapshots) mid-chain in rounds
# 3 and 4 because .gitignore excludes evidence/**/{buffer,snapshots,dataset*}
# and runs/. Git-tracked files SURVIVE resets, so this loop force-commits the
# r5 chain's stage artifacts every ~15 min until told to stop.
#
# Usage: sh scripts/git_watcher_r5.sh &   (stop: touch /tmp/stop_watcher_r5)
cd /root/repo
while [ ! -f /tmp/stop_watcher_r5 ]; do
    sleep 900
    # -f bypasses the ignore rules. One add per path: `git add A B` aborts
    # ENTIRELY when any single pathspec doesn't exist yet
    for p in evidence/pipeline/collect_r5 evidence/pipeline/dataset_r5 \
        evidence/pipeline/wm_r5 evidence/pipeline/beh_post_r5 \
        evidence/pipeline/beh_conn_r5 evidence/pipeline/finetune_r5 \
        evidence/p2e; do
        [ -e "$p" ] && git add -f "$p" 2>/dev/null
    done
    for f in runs/*.log runs/*.status; do
        [ -e "$f" ] && git add -f "$f" 2>/dev/null
    done
    git commit -q -m "r5 chain watcher: periodic artifact checkpoint" \
        >/dev/null 2>&1 || true
done
rm -f /tmp/stop_watcher_r5
