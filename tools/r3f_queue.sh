#!/bin/bash
# Round-3f TPU queue — reordered from r3e so short measurement jobs land
# before the chip-hour training run, with a hard deadline so the driver's
# end-of-round bench.py finds a free chip. Short first, training last with
# whatever time remains.
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

DEADLINE=${R3F_DEADLINE:-$(( $(date +%s) + 9000 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

# 1) Serving-layer throughput/latency (fast: one compile + steady waves).
if (( $(left) > 900 )); then
    timeout 1500 python tools/r3_serve_tpu.py > logs/serve_tpu.log 2>&1
fi

# 2) Heterogeneous 256^3: 3D two-level vs CSLP to a common tolerance.
if (( $(left) > 1800 )); then
    timeout 2400 python tools/r3_3d_twolevel_tpu.py \
        > logs/r3_3d_twolevel.log 2>&1
fi

# 3) 8192^2 two-level FGMRES (budget trimmed to fit the round).
if (( $(left) > 2400 )); then
    B=$(( $(left) - 900 )); (( B > 2400 )) && B=2400
    TL8192_BUDGET_S=$B timeout $(( B + 600 )) python tools/r3_8192_twolevel.py \
        > logs/r3_8192_twolevel.log 2>&1
fi

# 4) r3d combined-curriculum training with the remaining time, minus a
#    reserve for its evaluation stage. Skip if under 30 min of train time.
EVAL_RESERVE=1500
TRAIN_S=$(( $(left) - EVAL_RESERVE ))
if (( TRAIN_S > 1800 )); then
    H=$(python -c "print(round($TRAIN_S/3600.0, 2))")
    timeout $(( TRAIN_S + 300 )) python tools/train_tpu_run.py \
        --hours "$H" --tag tpu_r3d \
        --init-from tpu_r3a --lr 1e-4 \
        --p-random-source 0.5 --p-extended-source 0.15 \
        --val-extended-frac 0.25 \
        > logs/train_r3d.log 2>&1
    E=$(left); (( E > EVAL_RESERVE )) || E=$EVAL_RESERVE
    timeout $E python tools/eval_trained.py --tag tpu_r3d --data-tag tpu_r2c \
        --iterations 500 --extended --md-name TRAINING_r3d.md \
        --header "Training run tpu_r3d (TPU v5e) — combined-curriculum flagship: warm start from tpu_r3a best (epoch 950), p_random_source=0.5 / p_extended_source=0.15, lr reset to 1e-4 with plateau decay, 25% line-source validation mix. Goal: one checkpoint matching tpu_r2c on the standard protocols while keeping tpu_r3a's 0/32 extended-source robustness (TRAINING_r3a.md measured the r2c/r3a split)." \
        > logs/eval_r3d.log 2>&1
fi

echo QUEUE-R3F DONE
