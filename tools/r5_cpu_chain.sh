#!/bin/bash
# Round-5 CPU chain — sharded-training quality evidence (VERDICT r4 #2).
# Waits for the in-flight sharded_quality_dyx run (exact PID), then:
#   1. posthoc-scores its checkpoints with the MEDIAN metric,
#   2. re-runs the same-seed single-device comparison to the same depth
#      with the median-keyed tool (the r4 `none` run stopped at 150
#      epochs; checkpoint-level parity needs equal budgets),
#   3. posthoc-scores the single-device checkpoints.
# Every item goes through tools/qrun.py -> logs/r5_queue_status.json.
# Launch: PREV_PID=<pid> nohup bash tools/r5_cpu_chain.sh \
#     > logs/r5_cpu_chain.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

if [[ -n "${PREV_PID:-}" ]]; then
    while kill -0 "$PREV_PID" 2>/dev/null; do sleep 120; done
fi

python tools/qrun.py --status "$STATUS" --name posthoc_dyx --timeout 3600 \
    -- env PH_TAG=sharded_quality_dyx PH_UNROLL=5 \
    python tools/r4_sharded_posthoc.py

python tools/qrun.py --status "$STATUS" --name train_none_500 \
    --timeout 21600 \
    -- env TS_MESH=none TS_EPOCHS=500 TS_HOURS=5 TS_MAPS=64 TS_BUFFER=64 \
    TS_BATCH=8 TS_UNROLL=5 TS_VAL_EVERY=25 TS_VAL_ITERS=300 TS_LR=1e-3 \
    python tools/r4_train_sharded_quality.py

python tools/qrun.py --status "$STATUS" --name posthoc_none --timeout 3600 \
    -- env PH_TAG=sharded_quality_none PH_UNROLL=5 \
    python tools/r4_sharded_posthoc.py

echo "r5 cpu chain done"
