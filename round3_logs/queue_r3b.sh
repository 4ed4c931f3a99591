#!/bin/bash
# Round-3 continuation: serial TPU queue (compile service is shared —
# CLAUDE.md landmine 8: never run two TPU jobs concurrently).
cd /root/repo
set -x
# 1. harsh x(1,1,16) advantage variant, candidates {1/16,1/4,1}
timeout 10800 python advantage_demo.py --iters 2000 --scales 1,1,16 \
  --shift_targets "0.0625,0.25,1.0" --platform tpu \
  --out round3_logs/advantage_demo_x16.json \
  > round3_logs/advantage_x16.log 2>&1
# 2. x(1,2,4) re-run under max-init (the committed fix for the mse-init collapse)
timeout 10800 python advantage_demo.py --iters 2000 --scales 1,2,4 \
  --shift_targets "0.25,0.5,1.0" --platform tpu \
  --out round3_logs/advantage_demo_x4max.json \
  > round3_logs/advantage_x4max.log 2>&1
# 3. MobileNetV2 accuracy rows (depthwise family end-to-end recovery)
timeout 10800 python run_accuracy.py --arch mobilenetv2 --iters 600 --platform tpu \
  --only "synth10:brecq:W2A4,synth10:fused+beta:W2A4,synth10:fused:W4A4,digits:brecq:W2A4" \
  --out ACCURACY_mnv2.md > round3_logs/mnv2_accuracy.log 2>&1
# 4. MNASNet harmonization accuracy cost
timeout 7200 python harm_accuracy.py --iters 600 --platform tpu \
  > round3_logs/harm_accuracy.log 2>&1
echo QUEUE_DONE
