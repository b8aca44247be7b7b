#!/bin/bash
# Round-3g TPU queue: the 8192^2 two-level rerun (first attempt died on
# the remote-compile 413 that core/hoist.py now fixes), then anything the
# r3f queue's deadline cut short. Launch behind the worker waiter:
#   R3G_DEADLINE=<epoch> nohup bash tools/wait_tpu_then.sh 7200 \
#       bash tools/r3g_queue.sh > logs/r3g_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

DEADLINE=${R3G_DEADLINE:-$(( $(date +%s) + 9000 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

# 1) 8192^2 two-level FGMRES with hoisted-constant compiles.
if (( $(left) > 2400 )); then
    B=$(( $(left) - 900 )); (( B > 3000 )) && B=3000
    TL8192_BUDGET_S=$B timeout $(( B + 600 )) python tools/r3_8192_twolevel.py \
        > logs/r3_8192_twolevel.log 2>&1
fi

# 2) r3d evaluation, if the r3f queue's training finished but its eval
#    stage was cut off (TRAINING_r3d.md absent while the checkpoint exists).
if [[ -d checkpoints/tpu_r3d && ! -f TRAINING_r3d.md ]] && (( $(left) > 1500 )); then
    timeout $(( $(left) )) python tools/eval_trained.py --tag tpu_r3d \
        --data-tag tpu_r2c --iterations 500 --extended \
        --md-name TRAINING_r3d.md \
        --header "Training run tpu_r3d (TPU v5e) — combined-curriculum flagship: warm start from tpu_r3a best (epoch 950), p_random_source=0.5 / p_extended_source=0.15, lr reset to 1e-4 with plateau decay, 25% line-source validation mix. Goal: one checkpoint matching tpu_r2c on the standard protocols while keeping tpu_r3a's 0/32 extended-source robustness (TRAINING_r3a.md measured the r2c/r3a split)." \
        > logs/eval_r3d.log 2>&1
fi

echo QUEUE-R3G DONE
