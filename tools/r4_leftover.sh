#!/bin/bash
# Leftover chip time after the r4 queue: does recycled two-level beat
# CSLP at 4096^2 (gmres_4096_highk: 9.7e-5 in 325 s)? If yes, the
# solve_auto recycled threshold moves down a size class.
set -x
cd "$(dirname "$0")/.."
if [[ -n "${PREV_PID:-}" ]]; then
    while kill -0 "$PREV_PID" 2>/dev/null; do sleep 120; done
fi
bash tools/wait_tpu_then.sh 3600 true && \
R4_N=4096 R4_RESTART=3 R4_RECYCLE_K=1 R4_COARSE_RESTART=8 \
R4_BUDGET_S=700 R4_SCHEDULE=1:0 R4_TOL=1e-4 R4_KEY=helm_4096_recycled \
    timeout 1500 python tools/r4_8192_recycled.py > logs/r4_4096_recycled.log 2>&1
