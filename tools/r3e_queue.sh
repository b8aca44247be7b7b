#!/bin/bash
# Round-3e TPU queue: flagship combined-curriculum training run (tpu_r3d)
# followed by its evaluation on standard + extended protocols. Serialized —
# one chip. Each stage logs separately; failures don't block later stages.
set -x
cd "$(dirname "$0")/.."

# r3d: one checkpoint for BOTH regimes. Warm start from r3a best (the
# extended-curriculum weights), keep a reduced extended fraction so the
# line-source robustness is retained while the standard protocols recover
# toward r2c quality. lr reset to 1e-4 (r3a's plateau floor was 1.3e-5).
timeout 9000 python tools/train_tpu_run.py --hours 2.3 --tag tpu_r3d \
    --init-from tpu_r3a --lr 1e-4 \
    --p-random-source 0.5 --p-extended-source 0.15 \
    --val-extended-frac 0.25 \
    > logs/train_r3d.log 2>&1

# Score r3d checkpoints on the IDENTICAL held-out maps as r2c/r3a
# (data-tag tpu_r2c) on both protocols.
timeout 3600 python tools/eval_trained.py --tag tpu_r3d --data-tag tpu_r2c \
    --iterations 500 --extended --md-name TRAINING_r3d.md \
    --header "Training run tpu_r3d (TPU v5e) — combined-curriculum flagship: warm start from tpu_r3a best (epoch 950), 2.3 h at p_random_source=0.5 / p_extended_source=0.15, lr reset to 1e-4 with plateau decay, 25% line-source validation mix. Goal: one checkpoint matching tpu_r2c on the standard protocols while keeping tpu_r3a's 0/32 extended-source robustness (TRAINING_r3a.md measured the r2c/r3a split)." \
    > logs/eval_r3d.log 2>&1

# Serving-layer throughput/latency on the chip (compiles once, then
# steady-state waves through the micro-batching path).
timeout 2400 python tools/r3_serve_tpu.py > logs/serve_tpu.log 2>&1

# 8192^2 two-level FGMRES — the depth-2 hierarchy the multilevel
# analysis prescribes at this discretization (restart-4 CSLP plateaued).
TL8192_BUDGET_S=3000 timeout 4200 python tools/r3_8192_twolevel.py \
    > logs/r3_8192_twolevel.log 2>&1

# Heterogeneous 256^3: 3D two-level vs CSLP to a common tolerance.
timeout 2400 python tools/r3_3d_twolevel_tpu.py \
    > logs/r3_3d_twolevel.log 2>&1

echo QUEUE-R3E DONE
