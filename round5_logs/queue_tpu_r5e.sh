#!/bin/bash
set -x
cd /root/repo
while [ ! -f /tmp/queue_r5d_done ]; do sleep 60; done
# rerun the 16k packed probes on the fixed (args-not-closures) harness
PACKED_K=16384 PACKED_N=16384 PACKED_M=1 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_16k_m1.json \
  > /tmp/bench_packed_16k_m1b.log 2>&1
PACKED_K=16384 PACKED_N=16384 PACKED_M=8 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_16k_m8.json \
  > /tmp/bench_packed_16k_m8b.log 2>&1
touch /tmp/queue_r5e_done
