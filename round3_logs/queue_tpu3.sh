#!/bin/bash
# after the x16 advantage demo (queue_tpu2, pid 21028): harmonization
# accuracy A/B on a trained mnasnet-cifar (train + 2 cli runs on TPU)
cd /root/repo
while kill -0 21028 2>/dev/null; do sleep 60; done
python harm_accuracy.py --iters 600 --platform tpu > round3_logs/harm_accuracy.log 2>&1
