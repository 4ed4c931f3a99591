#!/bin/bash
set -x
cd /root/repo
# act-shift story, second seed (TPU)
python -u advantage_demo.py --platform tpu --iters 300 --seed 11 \
  --scales 1,1,16 --shift_targets 0.0625,0.25,1.0 --act_quant true \
  --arms two_phase --extra "--act_mode delta --skip_test true" \
  --suffix _actdelta --out round5_logs/adv_x16_actdelta_s11.json \
  > /tmp/adv_x16_actdelta_s11.log 2>&1
python -u advantage_demo.py --platform tpu --iters 300 --seed 11 \
  --scales 1,1,16 --shift_targets 0.0625,0.25,1.0 --act_quant true \
  --arms two_phase \
  --extra "--act_mode shift --act_shift_targets 1.0,0.25,0.0625 --skip_test true" \
  --suffix _actshift --out round5_logs/adv_x16_actshift_s11.json \
  > /tmp/adv_x16_actshift_s11.log 2>&1
# compute-bound packed shape with the new kernel (old table: 1.39 vs 1.19 ms)
PACKED_M=8192 PACKED_K=1024 PACKED_N=1024 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_compute_v3.json \
  > /tmp/bench_packed_compute_v3.log 2>&1
touch /tmp/queue_r5h_done
