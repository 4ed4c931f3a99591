#!/bin/bash
cd /root/repo
while kill -0 19909 2>/dev/null; do sleep 60; done
python advantage_demo.py --iters 2000 --scales 1,1,16 \
  --shift_targets "0.0625,0.25,1.0" --platform tpu \
  --out round3_logs/advantage_demo_x16.json \
  > round3_logs/advantage_x16.log 2>&1
python advantage_demo.py --iters 2000 --scales 1,2,4 \
  --shift_targets "0.25,0.5,1.0" --platform tpu \
  --out round3_logs/advantage_demo_x4max.json \
  > round3_logs/advantage_x4max.log 2>&1
python harm_accuracy.py --iters 600 --platform tpu > round3_logs/harm_accuracy.log 2>&1
