#!/bin/bash
# Round-5 TPU queue, part 3 — the 256^2 learned-envelope adjudication.
# The 512^2 adjudication showed CSLP reaching the learned terminal
# accuracy 4x faster (results/adjudication_512.json); serve_mixed shows
# the 96^2-trained model RESIZED to 256^2 reaching median best-rmse
# 9.4e-6 — terminal quality intact one doubling up. This measures the
# learned-vs-CSLP wall-clock at 256^2 on a held-out ellipse set
# (datasets/eval256) so LEARNED_MAX_GRID lands on evidence at every
# size class: 96 (gmres_sweep_96, n=1000), 256 (this), 512/1024
# (adjudication_{512,1024}.json).
# Launch: PREV_PIDS="<q2 pid>" nohup bash tools/r5_queue3.sh \
#     > logs/r5_queue3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

for pid in ${PREV_PIDS:-}; do
    while kill -0 "$pid" 2>/dev/null; do sleep 120; done
done

wait_tpu() { bash tools/wait_tpu_then.sh 5400 true; }

wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name adjudicate_256_r2c --timeout 2400 \
    -- env LG_SIZE=256 LG_TAG=tpu_r2c LG_DATA_TAG=eval256 LG_BATCH=8 \
    LG_ITERS=2000 LG_TOTAL_BUDGET_S=2000 \
    python tools/r4_adjudicate_large.py

echo "r5 queue3 done"
