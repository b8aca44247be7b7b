#!/bin/bash
# Round-5 TPU queue, part 6 (fresh-container session) — the still-queued
# chip items, most-cited-first:
#   1. skull_auto_512_v2: the flagship CT demo re-run under the
#      CORRECTED policy (contrast 2.0 at 512^2 now routes two_level with
#      the learned smoother; ROUND5.md item 8 cites this as Queued).
#   2. adjudicate_1024_r2c_resized: is the r2c zero-shot resize win
#      scale-stable one more doubling up (TRAINING512.md cites this)?
#   3. bench_warm: full-budget bench.py to warm the remote compile cache
#      for the driver's end-of-round run and pick up the matched
#      batch-128 torch baseline written by torch_baseline_b128.
# Do not edit while running; chain further work as a NEW file.
# Launch: nohup bash tools/r5_queue6.sh > logs/r5_queue6.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

wait_tpu() { bash tools/wait_tpu_then.sh 5400 true; }

wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name skull_auto_512_v2 --timeout 2700 \
    -- python tools/r5_skull_auto.py

wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name adjudicate_1024_r2c_resized --timeout 2700 \
    -- env LG_SIZE=1024 LG_TAG=tpu_r2c LG_DATA_TAG=tpu_r3c1024 \
    LG_TOTAL_BUDGET_S=2200 python tools/r4_adjudicate_large.py

wait_tpu && python tools/qrun.py --status "$STATUS" --name bench_warm \
    --timeout 2400 -- env BENCH_BUDGET_S=2000 python bench.py

echo "r5 queue6 done"
