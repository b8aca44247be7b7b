#!/bin/bash
# Round-5 TPU queue, part 2 — constructive response to the 512^2
# adjudication: the tpu_r3b512 checkpoint got only 0.6 h of training
# (TRAINING512.md) and its terminal rollout quality (median best rmse
# 4.5e-3 at 3000 iterations) is far above the 96^2 level; continue it
# ~1.8 h warm-started (full epoch budget per resolve_epoch_cap), then
# re-adjudicate the continued model against CSLP at its own matched
# accuracy. Runs after tools/r5_queue.sh releases the chip.
# Launch: PREV_PIDS="<r5_queue_pid>" nohup bash tools/r5_queue2.sh \
#     > logs/r5_queue2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

for pid in ${PREV_PIDS:-}; do
    while kill -0 "$pid" 2>/dev/null; do sleep 120; done
done

# same dataset as tpu_r3b512 (deterministic seed 42 — copying skips the
# regeneration and guarantees the held-out val maps are identical)
mkdir -p datasets/tpu_r5b512
cp -n datasets/tpu_r3b512/maps.npz datasets/tpu_r5b512/maps.npz

wait_tpu() { bash tools/wait_tpu_then.sh 5400 true; }

wait_tpu && python tools/qrun.py --status "$STATUS" --name train_r5b512 \
    --timeout 7800 -- python tools/train_tpu_run.py \
    --size 512 --tag tpu_r5b512 --init-from tpu_r3b512 --hours 1.8 \
    --train-maps 240 --val-maps 16 --buffer 96 --batch 4 --unroll 3 \
    --lr 1e-4 --val-every 5 --val-iters 300 --p-random-source 0.5

wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name adjudicate_512_r5b --timeout 2700 \
    -- env LG_SIZE=512 LG_TAG=tpu_r5b512 LG_TOTAL_BUDGET_S=2400 \
    python tools/r4_adjudicate_large.py

echo "r5 queue2 done"
