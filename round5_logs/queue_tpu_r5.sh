#!/bin/bash
# Round-5 serialized TPU queue (CLAUDE.md landmine 8: one TPU client at a
# time). Each step logs under /tmp; run steps strictly in order.
set -x
cd /root/repo

# 1. ResNet-50 full-budget trained-state row + deploy parity (VERDICT r4
#    weak #3): the 2000-iter state (round-3 sim 92.5%) through the
#    deploy==sim check on the real chip.
python -u run_accuracy.py --arch resnet50 --platform tpu --iters 2000 \
  --iters_a 300 --only synth10:brecq:W2A4 --out ACCURACY_r50_r5.md \
  > /tmp/run_acc_r50_r5.log 2>&1

# 2. Serving-shape sweep (batch 1/64/128 x five families) + packed-W2
#    design-regime demonstration (VERDICT r4 weak #7).
python -u bench_serving.py --sweep --packed \
  --out round5_logs/bench_serving.json > /tmp/bench_serving_r5.log 2>&1

# 3. Official bench sanity on the current tree (now with the ENFORCING
#    parity gate — a nonzero exit here means the deploy path broke).
python -u bench.py > /tmp/bench_r5_sanity.log 2>&1
echo "bench rc=$?" >> /tmp/bench_r5_sanity.log

touch /tmp/queue_r5_done
