#!/bin/bash
# serialize TPU benches behind the fused 20k run (compile service is shared)
cd /root/repo
while kill -0 19472 2>/dev/null; do sleep 60; done
BENCH_PING_TIMEOUT=600 timeout 2400 python bench.py > round3_logs/bench_r18_check.log 2>&1
BENCH_ARCH=mobilenetv2 BENCH_PING_TIMEOUT=600 timeout 2400 python bench.py > round3_logs/bench_mnv2_check.log 2>&1
BENCH_ARCH=resnet50 BENCH_PING_TIMEOUT=600 timeout 2400 python bench.py > round3_logs/bench_r50_check.log 2>&1
BENCH_ARCH=regnetx_600m BENCH_PING_TIMEOUT=600 timeout 2400 python bench.py > round3_logs/bench_regnet_check.log 2>&1
BENCH_ARCH=mnasnet SSQ_HARMONIZE=1 BENCH_PING_TIMEOUT=600 timeout 2400 python bench.py > round3_logs/bench_mnasnet_harm2.log 2>&1
