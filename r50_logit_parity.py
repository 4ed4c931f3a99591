"""Logit-level sim-vs-deploy parity on the R50 W2A8 trained state.

Top-1 deltas on a 1024-sample test set quantize at ~0.1%/image, so a
0.2-point delta is 2-3 borderline images — the sharper parity metric is
the one the bench gate uses: argmax agreement + logit relative MSE
between sim and deploy on the SAME inputs (miscompile-class failures
measure O(1)/NaN; legitimate half-even vs half-up drift ~1e-3).

Usage: python r50_logit_parity.py [--platform cpu|tpu]
Writes round5_logs/r50_logit_parity.json.
"""
import argparse
import contextlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
ap.add_argument("--n", type=int, default=256)
ap.add_argument("--out", default="round5_logs/r50_logit_parity.json")
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

cpu_devs = jax.local_devices(backend="cpu")
setup_ctx = jax.default_device(cpu_devs[0]) if A.platform == "tpu" \
    else contextlib.nullcontext()

result = {}
with setup_ctx:
    graph, _ = zoo.build("resnet50", dataset="synth10")
    raw = load_raw_params("trained_resnet50_synth10.npz")
    qstate, _ = ckpt.load_qstate(
        "./checkPoint/acc_synth10_resnet50_brecq/QNN_W2_A4")
    tr, _ = build_synth10_data(batch_size=64, seed=1005)
    cali = get_train_samples(tr, 256)
    x_te, _ = synth10_test_arrays()
    xs = jnp.asarray(x_te[: A.n])
flags_w = ssq.Flags().all_weights(graph)

for nba in (8, 4):
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=nba)
    with setup_ctx:
        params, _ = ssq.prepare_model(graph, raw, cfg)
        qs = ssq.calibrate_acts(graph, params, qstate, cali[:64], cfg,
                                flags=flags_w)
        flags_a = act_flags(graph, cfg, base=flags_w)
        dparams = deploy.build_deploy_params(graph, params, qs)
        steps = deploy.act_steps_from_qstate(graph, qs)
        os.environ["SSQ_STEM_1PASS"] = "0"   # exact 2-pass stem
        plan = deploy.make_deploy_plan(graph, dparams, steps,
                                       input_hw=(32, 32))
        os.environ.pop("SSQ_STEM_1PASS", None)
    sim = np.asarray(jax.jit(
        lambda a, p=params, q=qs, f=flags_a: ssq.forward(graph, p, q, a, f)
    )(xs), np.float64)
    dep = np.asarray(jax.jit(
        lambda a, dp=dparams, st=steps, pl=plan:
        deploy.deploy_forward(graph, dp, st, a, plan=pl))(xs), np.float64)
    row = {
        "agreement": float((sim.argmax(-1) == dep.argmax(-1)).mean()),
        "logit_rel_mse": float(((sim - dep) ** 2).mean()
                               / max(float((sim ** 2).mean()), 1e-30)),
        "max_abs_logit_diff": float(np.abs(sim - dep).max()),
        "n": A.n,
    }
    result[f"W2A{nba}"] = row
    print(f"W2A{nba}: {row}", flush=True)

os.makedirs(os.path.dirname(A.out), exist_ok=True)
with open(A.out, "w") as f:
    json.dump(result, f, indent=1)
print(json.dumps(result))
