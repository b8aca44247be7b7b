#!/bin/bash
# Round-5 TPU queue, part 2 — constructive response to the 512^2
# adjudication: (a) measure the 96^2-trained tpu_r2c RESIZED to 512 on
# the same held-out maps (resize-at-inference vs natively-trained —
# skull_512_plain_forward suggests the resized model may win), then
# (b) continue tpu_r3b512 ~1.8 h warm-started (it got only 0.6 h,
# TRAINING512.md) and re-adjudicate the continued model.
# Launch: PREV_PIDS="<r5_queue_pid>" nohup bash tools/r5_queue2.sh \
#     > logs/r5_queue2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

for pid in ${PREV_PIDS:-}; do
    while kill -0 "$pid" 2>/dev/null; do sleep 120; done
done

wait_tpu() { bash tools/wait_tpu_then.sh 5400 true; }

# (a) resized-96-model comparison on the identical 512^2 val maps
wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name adjudicate_512_r2c_resized --timeout 2700 \
    -- env LG_SIZE=512 LG_TAG=tpu_r2c LG_DATA_TAG=tpu_r3b512 \
    LG_TOTAL_BUDGET_S=2200 python tools/r4_adjudicate_large.py

# (b) 512^2 training continuation + re-adjudication
mkdir -p datasets/tpu_r5b512
cp -n datasets/tpu_r3b512/maps.npz datasets/tpu_r5b512/maps.npz

wait_tpu && python tools/qrun.py --status "$STATUS" --name train_r5b512 \
    --timeout 7500 -- python tools/train_tpu_run.py \
    --size 512 --tag tpu_r5b512 --init-from tpu_r3b512 --hours 1.7 \
    --train-maps 240 --val-maps 16 --buffer 96 --batch 4 --unroll 3 \
    --lr 1e-4 --val-every 5 --val-iters 300 --p-random-source 0.5

wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name adjudicate_512_r5b --timeout 2700 \
    -- env LG_SIZE=512 LG_TAG=tpu_r5b512 LG_DATA_TAG=tpu_r3b512 \
    LG_TOTAL_BUDGET_S=2200 python tools/r4_adjudicate_large.py

echo "r5 queue2 done"
