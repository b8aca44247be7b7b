#!/bin/bash
# Round-5 CPU chain 3 (fresh-container session) — after the idle-CPU
# torch b128 baseline finishes:
#   1. posthoc_none: median-keyed posthoc scoring of the r4 single-
#      device run's checkpoints (150 epochs — the full budget that run
#      had; the 500-epoch matched-depth re-run needs ~5 h and is out of
#      this session's budget, documented in ROUND5.md).
#   2. full test suite (keep green).
# Launch: PREV_PID=<torch pid> nohup bash tools/r5_cpu_chain3.sh \
#     > logs/r5_cpu_chain3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

if [[ -n "${PREV_PID:-}" ]]; then
    while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
fi

python tools/qrun.py --status "$STATUS" --name posthoc_none --timeout 3600 \
    -- env PH_TAG=sharded_quality_none PH_UNROLL=5 \
    python tools/r4_sharded_posthoc.py

python tools/qrun.py --status "$STATUS" --name pytest_full --timeout 3600 \
    -- python -m pytest tests/ -q

echo "r5 cpu chain3 done"
