#!/bin/bash
# Round-4 serialized TPU queue (CLAUDE.md landmine 8: one TPU client at a
# time). Run AFTER harm_accuracy finishes; each step logs under /tmp.
set -x
cd /root/repo

# 1. advantage demo, x(1,2,4) imbalance, candidates {1/4,1/2,1} — with the
#    new fused_dequant=auto default this runs 'effective' semantics
python -u advantage_demo.py --platform tpu --iters 2000 \
  --out round4_logs/advantage_demo.json > /tmp/adv_r4_x4.log 2>&1

# 2. harsh x(1,1,16) variant, candidates {1/16,1/4,1}, act-FP (the
#    planted 16x ratio lives in conv1's OUTPUT activations — per-tensor
#    A4 cannot represent it for either arm; reference W2 rows are act-FP)
python -u advantage_demo.py --platform tpu --iters 2000 \
  --scales 1,1,16 --shift_targets 0.0625,0.25,1.0 --act_quant false \
  --out round4_logs/advantage_demo_x16.json > /tmp/adv_r4_x16.log 2>&1

# 3. MNV2 trained-state pipeline + deploy parity (the ACCURACY_mnv2 repro
#    with the fixed deploy path); one headline row + deploy_eval
python -u run_accuracy.py --arch mobilenetv2 --platform tpu \
  --only synth10:brecq:W2A4 --out ACCURACY_mnv2_r4.md \
  > /tmp/run_acc_mnv2_r4.log 2>&1

touch /tmp/queue_r4_done

# 4. ResNet-50 trained-state pipeline + deploy parity
python -u run_accuracy.py --arch resnet50 --platform tpu --iters 300 \
  --iters_a 150 --only synth10:brecq:W2A4 --out ACCURACY_r50_r4.md \
  > /tmp/run_acc_r50_r4.log 2>&1

# 5. RegNetX-600M: train on synth10 (cifar variant), then pipeline +
#    deploy parity — completes the 5-family trained-state matrix
python -u -m shiftedscalequantization_tpu.train --arch regnetx_600m \
  --dataset synth10 --steps 3000 --batch_size 128 \
  --out trained_regnetx_600m_synth10.npz > /tmp/train_regnet_r4.log 2>&1
python -u run_accuracy.py --arch regnetx_600m --platform tpu --iters 300 \
  --iters_a 150 --only synth10:brecq:W2A4 --out ACCURACY_regnet_r4.md \
  > /tmp/run_acc_regnet_r4.log 2>&1

touch /tmp/queue_r4_all_done

# 6. Re-measure per-arch throughput with the fixed bf16_codes path (the
#    round-3 MNV2/MNASNet/RegNet numbers ran NaN-poisoned convs) + the
#    new deploy_sim_agreement gate
BENCH_EXTRA_ARCHS=resnet50,mobilenetv2,regnetx_600m,mnasnet \
  python -u bench.py > round4_logs/bench_multiarch.json 2>/tmp/bench_multiarch.err
SSQ_HARMONIZE=1 BENCH_ARCH=mnasnet \
  python -u bench.py > round4_logs/bench_mnasnet_harm.json 2>/tmp/bench_harm.err

touch /tmp/queue_r4_bench_done

# 7. MNV2 perf lever sweep: route small-spatial thin 1x1s to the int8
#    path (SSQ_THIN_MINHW floor; thin_conv_probe round-3 showed int8
#    wins <=28px) + full-int8 extreme; fresh numbers post bf16_codes fix
for MINHW in 0 29 57 115; do
  SSQ_THIN_MINHW=$MINHW BENCH_ARCH=mobilenetv2 python -u bench.py \
    > round4_logs/bench_mnv2_minhw$MINHW.json 2>/dev/null
done
SSQ_THIN_CHANNELS=0 BENCH_ARCH=mobilenetv2 python -u bench.py \
  > round4_logs/bench_mnv2_allint8.json 2>/dev/null

touch /tmp/queue_r4_mnv2_done

# 8. Re-run both advantage demos with the post-harden rounding refinement
#    (engine post_round_frac, commit c4167e1) — same budgets
python -u advantage_demo.py --platform tpu --iters 2000 \
  --out round4_logs/advantage_demo.json > /tmp/adv_r4_x4b.log 2>&1
python -u advantage_demo.py --platform tpu --iters 2000 \
  --scales 1,1,16 --shift_targets 0.0625,0.25,1.0 --act_quant false \
  --out round4_logs/advantage_demo_x16.json > /tmp/adv_r4_x16b.log 2>&1
touch /tmp/queue_r4_demos2_done

# 9. MNASNet with 2-term int8 pair transport (no harmonization): the
#    compile-wedge trigger does not reproduce in the round-3 2-term form
#    (pair_compile_probe green); measure whether exact pair transport
#    alone closes the 0.75x no-harmonize gap
SSQ_PAIR_TRANSPORT=1 BENCH_ARCH=mnasnet timeout 1800 python -u bench.py \
  > round4_logs/bench_mnasnet_pairs.json 2>/tmp/bench_pairs.err
touch /tmp/queue_r4_pairs_done

# 10. ResNet-18 fresh trained-state deploy parity (round-2 evidence
#     refresh; cheap at 300 iters)
python -u run_accuracy.py --arch resnet18 --platform tpu --iters 300 \
  --iters_a 150 --only synth10:brecq:W2A4 --out ACCURACY_r18_r4.md \
  > /tmp/run_acc_r18_r4.log 2>&1
touch /tmp/queue_r4_final_done

# 11. barrier-variant A/B: parity (5-way agreement on the trained mnasnet
#     state) + MNV2/MNASNet throughput under SSQ_BF16_CAST=barrier
SSQ_BF16_CAST=barrier python -u debug_precision.py ./checkPoint/r4_mnasnet \
  mnasnet > /tmp/prec_barrier.log 2>&1
SSQ_BF16_CAST=barrier BENCH_ARCH=mobilenetv2 python -u bench.py \
  > round4_logs/bench_mnv2_barrier.json 2>/dev/null
SSQ_BF16_CAST=barrier BENCH_ARCH=mnasnet python -u bench.py \
  > round4_logs/bench_mnasnet_barrier.json 2>/dev/null
touch /tmp/queue_r4_barrier_done

# 12. x16 two-phase arm (reference shift->bake->round stack; selection
#     optimized on full dequant values, no soft-mixture crutch)
python -u advantage_demo.py --platform tpu --iters 2000 \
  --scales 1,1,16 --shift_targets 0.0625,0.25,1.0 --act_quant false \
  --out round4_logs/advantage_demo_x16.json > /tmp/adv_r4_x16c.log 2>&1
touch /tmp/queue_r4_x16c_done

# 13. dense-direct-cast optimization: re-verify parity + re-bench the
#     headline and the depthwise families
python -u debug_precision.py ./checkPoint/r4_mnasnet mnasnet \
  > /tmp/prec_densecast.log 2>&1
python -u bench.py > round4_logs/bench_r18_densecast.json 2>/dev/null
BENCH_ARCH=mobilenetv2 python -u bench.py \
  > round4_logs/bench_mnv2_densecast.json 2>/dev/null
SSQ_HARMONIZE=1 BENCH_ARCH=mnasnet python -u bench.py \
  > round4_logs/bench_mnasnet_harm2.json 2>/dev/null
touch /tmp/queue_r4_densecast_done
