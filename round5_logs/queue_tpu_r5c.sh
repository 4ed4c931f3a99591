#!/bin/bash
# Round-5 TPU queue, phase 3: R50 parity rows + packed design-regime
# shapes. Waits for phase 2.
set -x
cd /root/repo
while [ ! -f /tmp/queue_r5b_done ]; do sleep 60; done

# 1. ResNet-50 parity rows on the real chip: W2A8 deploy==sim at the
#    93% weight state; A4 act-shift rescue (VERDICT r4 weak #3 + #5).
python -u r50_parity_probe.py --platform tpu \
  --out round5_logs/r50_parity.json > /tmp/r50_parity_tpu.log 2>&1

# 2. Packed-W2 at larger weight-dominated shapes (HBM time >> kernel
#    overhead): K=N=16384 at M=1 and M=8.
PACKED_K=16384 PACKED_N=16384 PACKED_M=1 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_16k_m1.json \
  > /tmp/bench_packed_16k_m1.log 2>&1
PACKED_K=16384 PACKED_N=16384 PACKED_M=8 python -u bench_serving.py \
  --packed --out round5_logs/bench_packed_16k_m8.json \
  > /tmp/bench_packed_16k_m8.log 2>&1

touch /tmp/queue_r5c_done
