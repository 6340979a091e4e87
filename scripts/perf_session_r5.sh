#!/bin/sh
# Post-chain perf measurement (VERDICT r4 item 5 groundwork): once the r5
# evidence chain releases the single-client TPU, measure before optimizing —
# bench.py (driver contract) + the per-phase isolation profile of config #3,
# whose residual has been guessed at since round 2.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
while ! grep -q "chain done" runs/auto_r5.status 2>/dev/null; do sleep 120; done
echo "perf session start $(date -u +%H:%M:%S)" > runs/perf_r5.status
timeout 900 python -u bench.py > runs/bench_r5_post.log 2>&1
echo "bench rc=$? $(tail -1 runs/bench_r5_post.log)" >> runs/perf_r5.status
timeout 2400 python -u scripts/profile_phases.py > runs/profile_phases_r5.log 2>&1
echo "profile rc=$? at $(date -u +%H:%M:%S)" >> runs/perf_r5.status
git add -f runs/bench_r5_post.log runs/profile_phases_r5.log runs/perf_r5.status
git commit -q -m "r5: post-chain bench + per-phase profile" || true
echo "perf session done $(date -u +%H:%M:%S)" >> runs/perf_r5.status
