#!/bin/bash
set -x
cd /root/repo
while [ ! -f /tmp/queue_r5e_done ]; do sleep 30; done
# slot-sliced unpack kernel: remeasure the design-regime shapes
PACKED_K=16384 PACKED_N=16384 PACKED_M=1 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_16k_m1_v2.json \
  > /tmp/bench_packed_16k_m1_v2.log 2>&1
PACKED_K=16384 PACKED_N=16384 PACKED_M=8 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_16k_m8_v2.json \
  > /tmp/bench_packed_16k_m8_v2.log 2>&1
PACKED_K=8192 PACKED_N=8192 PACKED_M=1 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_8k_m1_v2.json \
  > /tmp/bench_packed_8k_m1_v2.log 2>&1
touch /tmp/queue_r5f_done
