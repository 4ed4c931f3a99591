#!/bin/bash
set -x
cd /root/repo
while [ ! -f /tmp/queue_r5f_done ]; do sleep 30; done
PACKED_K=16384 PACKED_N=16384 PACKED_M=1 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_16k_m1_v3.json \
  > /tmp/bench_packed_16k_m1_v3.log 2>&1
PACKED_K=8192 PACKED_N=8192 PACKED_M=1 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_8k_m1_v3.json \
  > /tmp/bench_packed_8k_m1_v3.log 2>&1
touch /tmp/queue_r5g_done
