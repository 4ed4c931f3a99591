#!/bin/bash
# Round-5 TPU queue, phase 2. Waits for phase 1 (queue_tpu_r5.sh) to
# finish — one TPU client at a time (CLAUDE.md landmine 8).
set -x
cd /root/repo
while [ ! -f /tmp/queue_r5_done ]; do sleep 60; done

# 1. Seed-replicated advantage tables (VERDICT r4 weak #5): 3 seeds x
#    {x(1,2,4), x(1,1,16)} x {300, 2000} iters, arms brecq / fused
#    (default, warm-started) / two_phase. Seed 7 re-run on the same
#    platform so each table is single-platform.
for SEED in 7 11 23; do
  for BUDGET in 300 2000; do
    python -u advantage_demo.py --platform tpu --iters $BUDGET \
      --seed $SEED --arms brecq,fused+beta,two_phase \
      --out round5_logs/adv_x124_${BUDGET}_s${SEED}.json \
      > /tmp/adv_x124_${BUDGET}_s${SEED}.log 2>&1
    python -u advantage_demo.py --platform tpu --iters $BUDGET \
      --seed $SEED --scales 1,1,16 --shift_targets 0.0625,0.25,1.0 \
      --act_quant false --arms brecq,fused+beta,two_phase \
      --out round5_logs/adv_x16_${BUDGET}_s${SEED}.json \
      > /tmp/adv_x16_${BUDGET}_s${SEED}.log 2>&1
  done
done
python aggregate_advantage.py 'round5_logs/adv_x124_300_s*.json' \
  'round5_logs/adv_x124_2000_s*.json' 'round5_logs/adv_x16_300_s*.json' \
  'round5_logs/adv_x16_2000_s*.json' > round5_logs/adv_seed_summary.md 2>&1

touch /tmp/queue_r5b_done
