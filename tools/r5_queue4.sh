#!/bin/bash
# Round-5 TPU queue, part 4 — follow-ups to the r2c-resized reversal
# (results/adjudication_512_tpu_r2c.json: the 96^2-trained model resized
# to 512^2 reaches median best rmse 8.9e-6 — 500x better than the
# natively-512-trained tpu_r3b512 — and goes 16/16 where CSLP stalls on
# 4/16):
#   1. train tpu_r5c512: 512^2 native training warm-started from the
#      RIGHT parent (tpu_r2c), 1.5 h — does native training on top of
#      the converged 96^2 weights beat zero-shot resize?
#   2. adjudicate it (LG_TAG=tpu_r5c512 on the same val maps),
#   3. adjudicate tpu_r2c resized to 1024^2 (is the resize win scale-
#      stable one more doubling up?).
# NEVER edit this file while it runs (bash reads incrementally — the
# r5_queue2 stray-offset lesson); chain new work as a NEW file.
# Launch: PREV_PIDS="<q3 pid>" nohup bash tools/r5_queue4.sh \
#     > logs/r5_queue4.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
STATUS=logs/r5_queue_status.json

for pid in ${PREV_PIDS:-}; do
    while kill -0 "$pid" 2>/dev/null; do sleep 120; done
done

mkdir -p datasets/tpu_r5c512
cp -n datasets/tpu_r3b512/maps.npz datasets/tpu_r5c512/maps.npz

wait_tpu() { bash tools/wait_tpu_then.sh 5400 true; }

wait_tpu && python tools/qrun.py --status "$STATUS" --name train_r5c512 \
    --timeout 6600 -- python tools/train_tpu_run.py \
    --size 512 --tag tpu_r5c512 --init-from tpu_r2c --hours 1.5 \
    --train-maps 240 --val-maps 16 --buffer 96 --batch 4 --unroll 3 \
    --lr 1e-4 --val-every 5 --val-iters 300 --p-random-source 0.5

wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name adjudicate_512_r5c --timeout 2700 \
    -- env LG_SIZE=512 LG_TAG=tpu_r5c512 LG_DATA_TAG=tpu_r3b512 \
    LG_TOTAL_BUDGET_S=2200 python tools/r4_adjudicate_large.py

wait_tpu && python tools/qrun.py --status "$STATUS" \
    --name adjudicate_1024_r2c_resized --timeout 2700 \
    -- env LG_SIZE=1024 LG_TAG=tpu_r2c LG_DATA_TAG=tpu_r3c1024 \
    LG_TOTAL_BUDGET_S=2200 python tools/r4_adjudicate_large.py

echo "r5 queue4 done"
