#!/bin/bash
# Round-5 CPU chain 2 — re-measure the torch reference baseline with the
# batch-128 x 500-iteration workload ON AN IDLE HOST (the matched
# baseline for the TPU throughput headline; running it while the
# single-device training run holds the cores would inflate the ratio).
# Launch: PREV_PID=<r5_cpu_chain pid> nohup bash tools/r5_cpu_chain2.sh \
#     > logs/r5_cpu_chain2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

if [[ -n "${PREV_PID:-}" ]]; then
    while kill -0 "$PREV_PID" 2>/dev/null; do sleep 120; done
fi

python tools/qrun.py --status "$STATUS" --name torch_baseline_b128 \
    --timeout 3600 -- python tools/bench_torch_baseline.py

echo "r5 cpu chain2 done"
