#!/bin/bash
# Round-5 TPU queue — runs after the r4 queue tail + 4096 probe release
# the chip. Order: the adjudications FIRST (verdict top item; the
# r4-tail attempts died on the status-dict shadowing bug, fixed in this
# round), then roofline (VERDICT 6), skull-CT policy demo (VERDICT 8),
# then a warm-cache full bench so BENCH_r05 covers every secondary
# entry (the r4 bench lost its budget to a 1043 s cold compile).
# Every item goes through tools/qrun.py -> logs/r5_queue_status.json
# (STARTED/DONE/FAILED/TIMEOUT; one stalled item must never eat the
# round silently again).
# Launch: PREV_PIDS="13207 19988" nohup bash tools/r5_queue.sh \
#     > logs/r5_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

for pid in ${PREV_PIDS:-}; do
    while kill -0 "$pid" 2>/dev/null; do sleep 120; done
done

wait_tpu() { bash tools/wait_tpu_then.sh 5400 true; }

# 0) learned-vs-classical adjudication, both trained scales (VERDICT 1)
wait_tpu && python tools/qrun.py --status "$STATUS" --name adjudicate_512 \
    --timeout 2700 -- env LG_SIZE=512 LG_TOTAL_BUDGET_S=2400 \
    python tools/r4_adjudicate_large.py
wait_tpu && python tools/qrun.py --status "$STATUS" --name adjudicate_1024 \
    --timeout 2700 -- env LG_SIZE=1024 LG_TOTAL_BUDGET_S=2400 \
    python tools/r4_adjudicate_large.py

# 1) measured roofline of the bench primary + batch scaling (VERDICT 6)
wait_tpu && python tools/qrun.py --status "$STATUS" --name roofline \
    --timeout 3000 -- python tools/r5_roofline.py

# 2) skull-CT flagship at 512^2 through the policy entry (VERDICT 8)
wait_tpu && python tools/qrun.py --status "$STATUS" --name skull_auto_512 \
    --timeout 2700 -- python tools/r5_skull_auto.py

# 3) full bench with a generous budget: warms every executable in the
#    compile cache so the driver's end-of-round `timeout 1200 bench.py`
#    covers all extras, and restores the skipped secondary entries now
wait_tpu && python tools/qrun.py --status "$STATUS" --name bench_full \
    --timeout 3600 -- env BENCH_BUDGET_S=3300 python bench.py

echo "r5 queue done"
