#!/bin/bash
# Round-3h TPU queue (CLAUDE.md next-session candidates):
#   1) serve bench at SERVE_BATCH=32 SERVE_CHUNK=500 — the throughput
#      headline (batch 8 was RTT/batch-bound at 33.7M gps);
#   2) 8192^2 two-level continuation at restart 3 / coarse_restart 8
#      (HBM fits) with every remaining second of budget.
# Launch behind the worker waiter:
#   R3H_DEADLINE=<epoch> nohup bash tools/wait_tpu_then.sh 3600 \
#       bash tools/r3h_queue.sh > logs/r3h_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

DEADLINE=${R3H_DEADLINE:-$(( $(date +%s) + 2700 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

# 1) serving throughput at the batch the micro-batching path is sized for
if (( $(left) > 600 )); then
    SERVE_WAVES=6 SERVE_BATCH=32 SERVE_ITERS=500 SERVE_CHUNK=500 \
        timeout $(( $(left) > 1200 ? 1200 : $(left) )) \
        python tools/r3_serve_tpu.py > logs/r3_serve_b32.log 2>&1
fi

# 2) 8192^2 two-level: restart 3 frees one 0.54 GB basis pair vs restart 4,
#    coarse_restart 8 halves the coarse transient; warm continuation of the
#    monotone descent measured in helm_8192_twolevel.
if (( $(left) > 600 )); then
    B=$(( $(left) - 240 ))
    TL8192_KEY=helm_8192_twolevel_r3c8 \
    TL8192_RESTART=3 TL8192_COARSE_RESTART=8 TL8192_BUDGET_S=$B \
        timeout $(( B + 200 )) python tools/r3_8192_twolevel.py \
        > logs/r3_8192_twolevel_b.log 2>&1
fi

echo QUEUE-R3H DONE
