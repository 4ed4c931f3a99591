#!/bin/bash
# serial CPU queue: wait for the running advantage demo, then the harsh
# 16x variant, then MNV2 accuracy rows
cd /root/repo
while kill -0 $(cat round3_logs/advantage.pid) 2>/dev/null; do sleep 60; done
python advantage_demo.py --iters 2000 --scales 1,1,16 \
  --shift_targets "0.0625,0.25,1.0" \
  --out round3_logs/advantage_demo_x16.json \
  > round3_logs/advantage_x16.log 2>&1
python run_accuracy.py --arch mobilenetv2 --iters 600 \
  --only "synth10:brecq:W2A4,synth10:fused+beta:W2A4,synth10:fused:W4A4,digits:brecq:W2A4" \
  --out ACCURACY_mnv2.md > round3_logs/mnv2_accuracy.log 2>&1
