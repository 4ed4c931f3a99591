#!/bin/bash
# Round-5 TPU queue, phase 2 (v2: --skip_test — per-node trajectory
# evals dominated wall-clock; the seed tables only need the FINAL
# number + selection match). Skips (config, budget, seed) combos whose
# output json already exists, so it can resume after interruption.
# One TPU client at a time (CLAUDE.md landmine 8).
set -x
cd /root/repo
while [ ! -f /tmp/queue_r5_done ]; do sleep 60; done
# wait out any still-running demo from a previous invocation
while pgrep -f "advantage_demo.py --platform tpu" > /dev/null; do sleep 30; done

for SEED in 7 11 23; do
  for BUDGET in 300 2000; do
    if [ ! -f round5_logs/adv_x124_${BUDGET}_s${SEED}.json ]; then
      python -u advantage_demo.py --platform tpu --iters $BUDGET \
        --seed $SEED --arms brecq,fused+beta,two_phase \
        --extra "--skip_test true" \
        --out round5_logs/adv_x124_${BUDGET}_s${SEED}.json \
        > /tmp/adv_x124_${BUDGET}_s${SEED}.log 2>&1
    fi
    if [ ! -f round5_logs/adv_x16_${BUDGET}_s${SEED}.json ]; then
      python -u advantage_demo.py --platform tpu --iters $BUDGET \
        --seed $SEED --scales 1,1,16 --shift_targets 0.0625,0.25,1.0 \
        --act_quant false --arms brecq,fused+beta,two_phase \
        --extra "--skip_test true" \
        --out round5_logs/adv_x16_${BUDGET}_s${SEED}.json \
        > /tmp/adv_x16_${BUDGET}_s${SEED}.log 2>&1
    fi
  done
done
python aggregate_advantage.py 'round5_logs/adv_x124_300_s*.json' \
  'round5_logs/adv_x124_2000_s*.json' 'round5_logs/adv_x16_300_s*.json' \
  'round5_logs/adv_x16_2000_s*.json' > round5_logs/adv_seed_summary.md 2>&1

touch /tmp/queue_r5b_done
