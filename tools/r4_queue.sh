#!/bin/bash
# Round-4 TPU queue — runs after the 8192^2 recycled job releases the
# chip. VERDICT items 5 (r3d retry), 2 (512/1024 adjudication),
# 9 (mixed-size serving), 6b (heterogeneous 3D training + eval).
# Launch:
#   R4_PREV_PID=<pid> R4_DEADLINE=<epoch> nohup bash tools/r4_queue.sh \
#       > logs/r4_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p logs

DEADLINE=${R4_DEADLINE:-$(( $(date +%s) + 21600 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

# wait for the previous chip job (by exact pid) to finish
if [[ -n "${R4_PREV_PID:-}" ]]; then
    while kill -0 "$R4_PREV_PID" 2>/dev/null; do sleep 60; done
fi

wait_tpu() { bash tools/wait_tpu_then.sh 5400 true; }

# 1) r3d retry with the fixed epoch budget (VERDICT 5): full re-anneal
#    from r3a this time (the r3 attempt got ~50 high-lr epochs).
if (( $(left) > 7200 )); then
    wait_tpu && timeout 5400 python tools/train_tpu_run.py \
        --hours 1.25 --tag tpu_r4d --init-from tpu_r3a --lr 1e-4 \
        --epoch-budget 900 \
        --p-random-source 0.5 --p-extended-source 0.15 \
        --val-extended-frac 0.25 > logs/train_r4d.log 2>&1
    wait_tpu && timeout 2400 python tools/eval_trained.py --tag tpu_r4d \
        --data-tag tpu_r2c --iterations 500 --extended \
        --md-name TRAINING_r4d.md \
        --header "Training run tpu_r4d (TPU v5e) — r3d retry with the fixed warm-start epoch budget (resolve_epoch_cap): warm start from tpu_r3a best, lr re-anneal 1e-4 with plateau decay over a FULL ~900-epoch budget (the r3d attempt was truncated to ~50 high-lr epochs by the epoch-1000 cap, TRAINING_r3d.md), p_random_source=0.5 / p_extended_source=0.15, 25% line-source validation mix. Goal: one checkpoint matching tpu_r2c on the standard protocols while keeping tpu_r3a's extended-source robustness." \
        > logs/eval_r4d.log 2>&1
fi

# 1b) plateau analysis at 2048^2 / 6.3 ppw (VERDICT 1's measured-analysis
#     clause + empirical recycling-value measurement at scale)
if (( $(left) > 2400 )); then
    wait_tpu && PA_BUDGET_S=240 timeout 2400 \
        python tools/r4_plateau_analysis.py > logs/plateau_2048.log 2>&1
fi

# 2) adjudicate learned vs classical at the trained scales (VERDICT 2)
if (( $(left) > 3000 )); then
    wait_tpu && LG_SIZE=512 timeout 2700 \
        python tools/r4_adjudicate_large.py > logs/adjudicate_512.log 2>&1
fi
if (( $(left) > 3000 )); then
    wait_tpu && LG_SIZE=1024 timeout 2700 \
        python tools/r4_adjudicate_large.py > logs/adjudicate_1024.log 2>&1
fi

# 3) mixed-size serving measurement (VERDICT 9)
if (( $(left) > 1500 )); then
    wait_tpu && timeout 1500 python tools/r4_serve_mixed.py \
        > logs/serve_mixed.log 2>&1
fi

# 4) heterogeneous 3D training at 64^3 with remat (VERDICT 6b) + eval
if (( $(left) > 2400 )); then
    HRS=$(python3 -c "print(max(min((${DEADLINE} - __import__('time').time() - 1500) / 3600, 2.0), 0.5))")
    wait_tpu && timeout $(( $(left) - 900 )) \
        python tools/train3d_tpu_run.py --hours "$HRS" --tag tpu3d_het \
        --size 64 --interior-heterogeneity 0.8 --buffer 48 --batch 4 \
        --val-every 5 --val-iters 200 > logs/train3d_het.log 2>&1
fi
if (( $(left) > 600 )); then
    wait_tpu && timeout $(( $(left) > 1800 ? 1800 : $(left) )) \
        python tools/eval3d_trained.py --tag tpu3d_het --size 64 \
        --md-name TRAINING3D_HET.md > logs/eval3d_het.log 2>&1
fi
echo "r4 queue done"
