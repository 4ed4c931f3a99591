"""Round-4 repro of VERDICT weak #2: trained MNASNet deploy != sim.

Runs the full CLI pipeline at tiny iteration count on CPU, then the
harm_accuracy.py deploy_check, then (if mismatched) bisects per-node with
deploy_forward(trace=...) vs the sim interpreter.
"""
import argparse
import contextlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=30)
ap.add_argument("--iters_a", type=int, default=15)
ap.add_argument("--arch", default="mnasnet")
ap.add_argument("--skip_cli", action="store_true",
                help="reuse existing ./checkPoint/dbg state")
ap.add_argument("--no_act_phase", action="store_true")
A = ap.parse_args()

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
cache = "/tmp/jax_cache_cpu"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

CKPT = f"trained_{A.arch}_synth10.npz"
TAG = f"dbg_{A.arch}"

if not A.skip_cli:
    from shiftedscalequantization_tpu import cli
    argv = ["--dataset", "synth10", "--arch", A.arch,
            "--pretrained", CKPT, "--mode", "brecq",
            "--n_bits_w", "2", "--n_bits_a", "4",
            "--iters_w", str(A.iters),
            "--iters_a", "0" if A.no_act_phase else str(A.iters_a),
            "--num_samples", "64", "--batch_size", "32",
            "--skip_test", "true",
            "--checkpoint_dir", f"./checkPoint/{TAG}",
            "--log_path", f"/tmp/{TAG}.log"]
    cli.main(argv)

# ---- deploy check (mirrors harm_accuracy.deploy_check) ----
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import shiftedscalequantization_tpu as ssq  # noqa: E402
from shiftedscalequantization_tpu import deploy  # noqa: E402
from shiftedscalequantization_tpu.data.realdata import synth10_test_arrays  # noqa: E402
from shiftedscalequantization_tpu.models import zoo  # noqa: E402
from shiftedscalequantization_tpu.quantize import act_flags  # noqa: E402
from shiftedscalequantization_tpu.train import load_raw_params  # noqa: E402
from shiftedscalequantization_tpu.utils import checkpoint as ckpt  # noqa: E402

graph, _ = zoo.build(A.arch, dataset="synth10")
raw = load_raw_params(CKPT)
cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4)
params, _ = ssq.prepare_model(graph, raw, cfg)
qstate, _ = ckpt.load_qstate(f"./checkPoint/{TAG}/QNN_W2_A4")
x_te, y_te = synth10_test_arrays()
flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
dparams = deploy.build_deploy_params(graph, params, qstate)
steps = deploy.act_steps_from_qstate(graph, qstate)
plan = deploy.make_deploy_plan(graph, dparams, steps, input_hw=(32, 32))


def top1(fn):
    good = tot = 0
    for i in range(0, min(len(x_te), 512), 256):
        xb = jnp.asarray(x_te[i:i + 256])
        pred = np.asarray(jnp.argmax(fn(xb), -1))
        good += int((pred == np.asarray(y_te[i:i + 256])).sum())
        tot += len(pred)
    return round(100.0 * good / tot, 3)


sim_fn = jax.jit(lambda x: ssq.forward(graph, params, qstate, x, flags))
dep_fn = jax.jit(lambda x: deploy.deploy_forward(graph, dparams, steps, x,
                                                 plan))
sim, dep = top1(sim_fn), top1(dep_fn)
agree = []
for i in range(0, min(len(x_te), 512), 256):
    xb = jnp.asarray(x_te[i:i + 256])
    agree.append(np.asarray(jnp.argmax(sim_fn(xb), -1))
                 == np.asarray(jnp.argmax(dep_fn(xb), -1)))
agreement = float(np.concatenate(agree).mean())
print(f"\n=== {A.arch}: sim top1 {sim}  deploy top1 {dep}  "
      f"argmax agreement {agreement:.4f}  "
      f"sum_sites {len(plan.get('__sum_steps__', {}))}")

if agreement < 0.99:
    print("MISMATCH -> per-node trace bisect")
    xb = jnp.asarray(x_te[:8])
    # sim per-node: use the interpreter's trace if available, else recompute
    # prefix outputs via capture
    dtrace = []
    deploy.deploy_forward(graph, dparams, steps, xb, plan, trace=dtrace)
    # sim node-by-node via forward(capture=name) (cap_out = node output)
    from shiftedscalequantization_tpu.graph import forward as sim_forward
    for name, dval in dtrace:
        try:
            _, s = sim_forward(graph, params, qstate, xb, flags,
                               capture=name)
        except Exception as e:  # node not capturable (e.g. OpSpec)
            print(f"{name}: sim capture failed ({e})")
            continue
        s, d = np.asarray(s), np.asarray(dval)
        if s.shape != d.shape:
            print(f"{name}: SHAPE sim{s.shape} dep{d.shape}")
            continue
        rel = float(np.abs(s - d).mean() / (np.abs(s).mean() + 1e-9))
        flag = " <<<<" if rel > 0.05 else ""
        print(f"{name}: rel {rel:.4g}{flag}")
