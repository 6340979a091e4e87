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
    # -f bypasses the ignore rules; --quiet commit exits 1 when nothing new
    git add -f evidence/pipeline/collect_r5 evidence/pipeline/dataset_r5 \
        evidence/pipeline/wm_r5 evidence/pipeline/beh_post_r5 \
        evidence/pipeline/beh_conn_r5 evidence/pipeline/finetune_r5 \
        evidence/p2e runs/*.log runs/*.status 2>/dev/null
    git commit -q -m "r5 chain watcher: periodic artifact checkpoint" \
        >/dev/null 2>&1 || true
done
rm -f /tmp/stop_watcher_r5
