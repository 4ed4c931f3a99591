"""ResNet-50 full-budget deploy-parity rows (VERDICT r4 weak #3 follow-up).

The 2000-iter W2A4 run (ACCURACY_r50_r5.md) reached 93.07% weight-only
but ~65% with per-tensor A4 acts — the act GRIDS are the bottleneck on
the deep bottleneck family (per-site ablation in round5_logs/), not the
optimizer. This probe produces the deploy==sim evidence the round-4
verdict actually asked for ("a high-accuracy parity row for the deepest
family") at act semantics that reach high accuracy, plus the A4
recovery attempt with per-channel activation shift selection:

  row 1: W2A8 — same hardened weight state, acts recalibrated at 8 bit;
         sim vs deploy (both stems) on this device.
  row 2: W2A4 + act-shift — per-channel ActShiftQuant selection
         (--act_mode shift machinery, reconstruct_act_shift) on the
         same state; sim top-1 before/after.

Usage: python r50_parity_probe.py [--platform cpu|tpu] [--skip_shift]
Writes round5_logs/r50_parity.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
ap.add_argument("--iters_shift", type=int, default=300)
ap.add_argument("--skip_shift", action="store_true")
ap.add_argument("--act_shift_targets", default="1.0,0.5,0.25,0.125")
ap.add_argument("--ckpt",
                default="./checkPoint/acc_synth10_resnet50_brecq/QNN_W2_A4")
ap.add_argument("--out", default="round5_logs/r50_parity.json")
A = ap.parse_args()

if A.platform == "cpu":
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if A.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    cache = "/tmp/jax_cache_cpu"
else:
    cache = "/tmp/jax_cache_axon"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import shiftedscalequantization_tpu as ssq  # noqa: E402
from shiftedscalequantization_tpu import deploy  # noqa: E402
from shiftedscalequantization_tpu.data.datasets import \
    build_synth10_data  # noqa: E402
from shiftedscalequantization_tpu.data.realdata import \
    synth10_test_arrays  # noqa: E402
from shiftedscalequantization_tpu.models import zoo  # noqa: E402
from shiftedscalequantization_tpu.quantize import act_flags  # noqa: E402
from shiftedscalequantization_tpu.train import load_raw_params  # noqa: E402
from shiftedscalequantization_tpu.utils import checkpoint as ckpt  # noqa: E402
from shiftedscalequantization_tpu.utils.eval import \
    get_train_samples  # noqa: E402

import contextlib  # noqa: E402

cpu_devs = jax.local_devices(backend="cpu")
setup_ctx = jax.default_device(cpu_devs[0]) if A.platform == "tpu" \
    else contextlib.nullcontext()

with setup_ctx:
    graph, _ = zoo.build("resnet50", dataset="synth10")
    raw = load_raw_params("trained_resnet50_synth10.npz")
    qstate, done = ckpt.load_qstate(A.ckpt)
    x_te, y_te = synth10_test_arrays()
    tr, _ = build_synth10_data(batch_size=64, seed=1005)
    cali = get_train_samples(tr, 256)

flags_w = ssq.Flags().all_weights(graph)
result = {"ckpt": A.ckpt, "platform": A.platform}


def top1(fn, bs=256):
    good = tot = 0
    for i in range(0, len(x_te), bs):
        p = np.asarray(jnp.argmax(fn(jnp.asarray(x_te[i:i + bs])), -1))
        good += int((p == np.asarray(y_te[i:i + bs])).sum())
        tot += len(p)
    return 100.0 * good / tot


for nba in (8, 4):
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=nba)
    with setup_ctx:
        params, _ = ssq.prepare_model(graph, raw, cfg)
        qs = ssq.calibrate_acts(graph, params, qstate, cali[:64], cfg,
                                flags=flags_w)
        flags_a = act_flags(graph, cfg, base=flags_w)
        dparams = deploy.build_deploy_params(graph, params, qs)
        steps = deploy.act_steps_from_qstate(graph, qs)
    row = {}
    t0 = time.time()
    sim_fn = jax.jit(lambda a, p=params, q=qs, f=flags_a:
                     ssq.forward(graph, p, q, a, f))
    row["sim"] = top1(sim_fn)
    for env in ("0", "1"):
        os.environ["SSQ_STEM_1PASS"] = env
        plan = deploy.make_deploy_plan(graph, dparams, steps,
                                       input_hw=(32, 32))
        fn = jax.jit(lambda a, p=plan, dp=dparams, st=steps:
                     deploy.deploy_forward(graph, dp, st, a, plan=p))
        row["deploy_2pass" if env == "0" else "deploy_1pass"] = top1(fn)
    os.environ.pop("SSQ_STEM_1PASS", None)
    row["wall_s"] = round(time.time() - t0, 1)
    result[f"W2A{nba}"] = row
    print(f"W2A{nba}: {row}", flush=True)

if not A.skip_shift:
    # act-shift rescue on A4: per-channel selection at every act site
    from shiftedscalequantization_tpu.quantize import reconstruction_targets
    from shiftedscalequantization_tpu.recon import ReconSettings, \
        reconstruct_model

    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4)
    with setup_ctx:
        params, _ = ssq.prepare_model(graph, raw, cfg)
        qs = ssq.calibrate_acts(graph, params, qstate, cali[:64], cfg,
                                flags=flags_w)
    sts = tuple(float(t) for t in A.act_shift_targets.split(","))
    s = ReconSettings(mode="fused", iters=A.iters_shift, batch_size=32,
                      act_shift_targets=sts)
    targets = reconstruction_targets(graph)
    t0 = time.time()
    qs2, _, _ = reconstruct_model(
        graph, params, qs, targets, cali, s, jax.random.PRNGKey(11),
        batch_size=64, base_flags=flags_w, act_phase="shift")
    flags_a = act_flags(graph, cfg, base=flags_w)
    sim_fn = jax.jit(lambda a: ssq.forward(graph, params, qs2, a, flags_a))
    result["W2A4_act_shift"] = {
        "sim": top1(sim_fn), "targets": list(sts),
        "iters": A.iters_shift, "wall_s": round(time.time() - t0, 1)}
    print(f"W2A4+act-shift: {result['W2A4_act_shift']}", flush=True)

os.makedirs(os.path.dirname(A.out), exist_ok=True)
with open(A.out, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result))
