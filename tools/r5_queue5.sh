#!/bin/bash
# Round-5 TPU queue, part 5 — final demos/bench under the corrected
# policy:
#   1. skull-CT 512^2 re-run: the r5 policy now routes contrast-2.0
#      512^2 to two_level (learned smoother, r2c ckpt); the first run
#      (old policy) measured the CSLP stall at 0.158 and the
#      native-512-checkpoint learned stall at 0.66 that motivated it.
#   2. bench.py with the matched batch-128 torch baseline (written by
#      r5_cpu_chain2) -> BENCH_DETAILS headline = throughput config.
# Do not edit while running; chain further work as a NEW file.
# Launch: PREV_PIDS="<q4 pid>" nohup bash tools/r5_queue5.sh \
#     > logs/r5_queue5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

for pid in ${PREV_PIDS:-}; do
    while kill -0 "$pid" 2>/dev/null; do sleep 120; done
done

wait_tpu() { bash tools/wait_tpu_then.sh 5400 true; }

wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name skull_auto_512_v2 --timeout 2700 \
    -- python tools/r5_skull_auto.py

wait_tpu && python tools/qrun.py --status "$STATUS" --name bench_final \
    --timeout 2400 -- env BENCH_BUDGET_S=2100 python bench.py

echo "r5 queue5 done"
