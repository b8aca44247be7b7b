#!/bin/bash
# Post-training TPU session for round 2: run after the tpu_r2a run exits.
# Each stage logs separately; failures don't block later stages.
set -x
cd "$(dirname "$0")/.."

timeout 2400 python tools/eval_trained.py --tag tpu_r2a --iterations 500 \
    --md-name TRAINING_r2a.md \
    --header "Flagship round-2 run: 9000 ellipse maps, bf16 network precision, lr 1e-3 with plateau decay, 50% random-circle training sources, in-run top-k=3 validation checkpointing every 10 epochs (500-iteration random-source val_loss). Device-resident replay buffer, ~16 s/epoch (281 steps) on one v5e chip." \
    > /tmp/eval_r2a.log 2>&1

timeout 3600 python tools/r2_tpu_extras.py > /tmp/r2_extras.log 2>&1

timeout 1200 python bench.py > /tmp/bench_r2.log 2>&1

echo DONE
