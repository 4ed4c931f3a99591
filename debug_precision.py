"""Test the sim-precision hypothesis for the trained-MNASNet deploy gap.

Hypothesis: on TPU, sim (fake-quant) runs f32 convs at DEFAULT precision
(bf16 passes, CLAUDE.md landmine 4) while deploy's int path is exact, so
their pre-requant values differ ~2^-8 relative and every 4-bit site flips
~% of codes -> compounding to chance on deep inverted-residual nets,
while CPU sim (exact f32) should agree with deploy.

Runs on whatever platform is default (TPU under axon); computes:
  sim_default, sim_highest (jax.default_matmul_precision), deploy
plus CPU-sim reference; prints a top-1 + pairwise agreement matrix.
"""
import os
import sys
import itertools

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

CKDIR = sys.argv[1] if len(sys.argv) > 1 else "./checkPoint/r4_mnasnet"
ARCH = sys.argv[2] if len(sys.argv) > 2 else "mnasnet"

os.makedirs("/tmp/jax_cache_axon", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import contextlib  # noqa: E402

import shiftedscalequantization_tpu as ssq  # noqa: E402
from shiftedscalequantization_tpu import deploy  # noqa: E402
from shiftedscalequantization_tpu.data.realdata import synth10_test_arrays  # noqa: E402
from shiftedscalequantization_tpu.models import zoo  # noqa: E402
from shiftedscalequantization_tpu.quantize import act_flags  # noqa: E402
from shiftedscalequantization_tpu.train import load_raw_params  # noqa: E402
from shiftedscalequantization_tpu.utils import checkpoint as ckpt  # noqa: E402

cpus = jax.local_devices(backend="cpu")
with jax.default_device(cpus[0]):
    graph, _ = zoo.build(ARCH, dataset="synth10")
    raw = load_raw_params(f"trained_{ARCH}_synth10.npz")
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4)
    params, _ = ssq.prepare_model(graph, raw, cfg)
    qstate, done = ckpt.load_qstate(f"{CKDIR}/QNN_W2_A4")
    print(f"{ARCH}: {len(done)} layers done in checkpoint", flush=True)
    x_te, y_te = synth10_test_arrays()
    flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
    dparams = deploy.build_deploy_params(graph, params, qstate)
    steps = deploy.act_steps_from_qstate(graph, qstate)
    plan = deploy.make_deploy_plan(graph, dparams, steps, input_hw=(32, 32))
    print("sum_sites:", len(plan.get("__sum_steps__", {})), flush=True)

accel = jax.devices()[0]
print("accel:", accel, flush=True)
p_acc, q_acc, dp_acc = jax.device_put((params, qstate, dparams), accel)
steps_acc = jax.device_put(steps, accel)


def preds(fn, device):
    out = []
    for i in range(0, 1024, 256):
        xb = jax.device_put(jnp.asarray(x_te[i:i + 256]), device)
        out.append(np.asarray(jnp.argmax(fn(xb), -1)))
    return np.concatenate(out)


def hp(fn):
    def wrapped(x):
        with jax.default_matmul_precision("highest"):
            return fn(x)
    return wrapped


runs = {}
runs["sim_tpu_default"] = preds(
    jax.jit(lambda x: ssq.forward(graph, p_acc, q_acc, x, flags)), accel)
print("sim_tpu_default done", flush=True)
runs["sim_tpu_highest"] = preds(
    jax.jit(hp(lambda x: ssq.forward(graph, p_acc, q_acc, x, flags))), accel)
print("sim_tpu_highest done", flush=True)
runs["deploy_tpu"] = preds(
    jax.jit(lambda x: deploy.deploy_forward(graph, dp_acc, steps_acc, x,
                                            plan)), accel)
print("deploy_tpu done", flush=True)
with jax.default_device(cpus[0]):
    runs["sim_cpu"] = preds(
        jax.jit(lambda x: ssq.forward(graph, params, qstate, x, flags)),
        cpus[0])
    print("sim_cpu done", flush=True)
    runs["deploy_cpu"] = preds(
        jax.jit(lambda x: deploy.deploy_forward(graph, dparams, steps, x,
                                                plan)), cpus[0])

y = np.asarray(y_te[:1024])
print("\ntop-1:")
for k, v in runs.items():
    print(f"  {k:18s} {100.0 * (v == y).mean():.3f}")
print("\npairwise argmax agreement:")
keys = list(runs)
for a, b in itertools.combinations(keys, 2):
    print(f"  {a:18s} vs {b:18s} {100.0 * (runs[a] == runs[b]).mean():.2f}")
