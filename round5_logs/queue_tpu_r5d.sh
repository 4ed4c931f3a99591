#!/bin/bash
set -x
cd /root/repo
while [ ! -f /tmp/queue_r5c_done ]; do sleep 60; done
python -u r50_logit_parity.py --platform tpu \
  --out round5_logs/r50_logit_parity.json > /tmp/r50_logit_parity.log 2>&1
touch /tmp/queue_r5d_done
