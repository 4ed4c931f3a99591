#!/bin/bash
cd /root/repo
while kill -0 $(cat round3_logs/advantage.pid) 2>/dev/null; do sleep 60; done
python run_accuracy.py --arch mobilenetv2 --iters 600 \
  --only "synth10:brecq:W2A4,synth10:fused+beta:W2A4,synth10:fused:W4A4,digits:brecq:W2A4" \
  --out ACCURACY_mnv2.md > round3_logs/mnv2_accuracy.log 2>&1
SSQ_SCALING_ITERS=40 timeout 2400 python bench_scaling.py SCALING_r03.json > round3_logs/scaling.log 2>&1
