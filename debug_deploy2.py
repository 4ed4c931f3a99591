"""Staged fast repro of trained-MNASNet deploy != sim (no recon loop).

Stage A: trained weights + quant-init + calibrate            (tests cover
         the same thing with random weights and pass)
Stage B: + brecq quantizer swap (init_adaround) + harden
Stage C: + act re-calibration with the post-recon prefix
Each stage checks sim vs deploy top-1 on 512 test images.
"""
import os
import sys
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import shiftedscalequantization_tpu as ssq  # noqa: E402
from shiftedscalequantization_tpu import deploy  # noqa: E402
from shiftedscalequantization_tpu.data.realdata import synth10_test_arrays  # noqa: E402
from shiftedscalequantization_tpu.data.datasets import build_synth10_data  # noqa: E402
from shiftedscalequantization_tpu.models import zoo  # noqa: E402
from shiftedscalequantization_tpu.quantize import act_flags  # noqa: E402
from shiftedscalequantization_tpu.train import load_raw_params  # noqa: E402
from shiftedscalequantization_tpu.utils.eval import get_train_samples  # noqa: E402
from shiftedscalequantization_tpu.ops import wquant as W  # noqa: E402

ARCH = os.environ.get("DBG_ARCH", "mnasnet")
graph, _ = zoo.build(ARCH, dataset="synth10")
raw = load_raw_params(f"trained_{ARCH}_synth10.npz")
cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4)
params, qstate = ssq.prepare_model(graph, raw, cfg)
train_loader, _ = build_synth10_data(batch_size=64, seed=1)
cali = get_train_samples(train_loader, 64)
x_te, y_te = synth10_test_arrays()
x_te, y_te = x_te[:512], y_te[:512]
flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))


def top1(fn):
    good = tot = 0
    for i in range(0, len(x_te), 256):
        xb = jnp.asarray(x_te[i:i + 256])
        pred = np.asarray(jnp.argmax(fn(xb), -1))
        good += int((pred == np.asarray(y_te[i:i + 256])).sum())
        tot += len(pred)
    return round(100.0 * good / tot, 3)


def check(tag, qs):
    dparams = deploy.build_deploy_params(graph, params, qs)
    steps = deploy.act_steps_from_qstate(graph, qs)
    plan = deploy.make_deploy_plan(graph, dparams, steps, input_hw=(32, 32))
    sim = top1(jax.jit(lambda x: ssq.forward(graph, params, qs, x, flags)))
    dep = top1(jax.jit(lambda x: deploy.deploy_forward(
        graph, dparams, steps, x, plan)))
    print(f"[{tag}] sim {sim}  deploy {dep}  "
          f"{'OK' if abs(sim - dep) <= 1.0 else 'MISMATCH  <<<<<<<'}",
          flush=True)
    return sim, dep, dparams, steps, plan


# ---- stage A
qstate = ssq.calibrate_acts(graph, params, qstate, cali[:64], cfg)
check("A quant-init", qstate)

# ---- stage B: adaround swap + immediate harden (zero-iteration 'recon')
from shiftedscalequantization_tpu.quantize import reconstruction_targets  # noqa: E402
targets = reconstruction_targets(graph)
qsB = dict(qstate)
from shiftedscalequantization_tpu.graph import find_node, node_unit_names  # noqa: E402
for t in targets:
    for name in node_unit_names(find_node(graph, t)):
        uq = qsB[name]
        wq = W.init_adaround(uq.wq.qp, params[name]["w"])
        wq = dataclasses.replace(wq, soft=False)
        qsB[name] = dataclasses.replace(uq, wq=wq)
check("B adaround-hard", qsB)

# ---- stage C: re-calibrate acts on the hardened state (cli.py:235)
qsC = ssq.calibrate_acts(graph, params, qsB, cali[:64], cfg)
check("C recalibrated", qsC)
