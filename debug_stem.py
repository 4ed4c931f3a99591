"""Microscope on the first divergent node (stem) of the trained-MNASNet
deploy mismatch: decompose sim-vs-deploy difference into conv / epilogue /
rounding contributions."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import shiftedscalequantization_tpu as ssq  # noqa: E402
from shiftedscalequantization_tpu import deploy  # noqa: E402
from shiftedscalequantization_tpu.data.realdata import synth10_test_arrays  # noqa: E402
from shiftedscalequantization_tpu.models import zoo  # noqa: E402
from shiftedscalequantization_tpu.quantize import act_flags  # noqa: E402
from shiftedscalequantization_tpu.train import load_raw_params  # noqa: E402
from shiftedscalequantization_tpu.utils import checkpoint as ckpt  # noqa: E402
from shiftedscalequantization_tpu.graph import forward as sim_forward  # noqa: E402

UNIT = "model.layers.0"
graph, _ = zoo.build("mnasnet", dataset="synth10")
raw = load_raw_params("trained_mnasnet_synth10.npz")
cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4)
params, _ = ssq.prepare_model(graph, raw, cfg)
qstate, done = ckpt.load_qstate("./checkPoint/dbg_mnasnet/QNN_W2_A4")
print("done layers:", len(done))
x_te, _ = synth10_test_arrays()
xb = jnp.asarray(x_te[:8])
flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))

uq = qstate[UNIT]
wq = uq.wq
print("wq type:", type(wq).__name__, "soft:", getattr(wq, "soft", None))
print("aq delta:", np.asarray(uq.aq.delta), "zp:", np.asarray(uq.aq.zero_point),
      "n_bits:", uq.aq.n_bits, "sym:", uq.aq.sym)

# sim output
_, sim_out = sim_forward(graph, params, qstate, xb, flags, capture=UNIT)
sim_out = np.asarray(sim_out)

# deploy manual
dparams = deploy.build_deploy_params(graph, params, qstate)
d = dparams[UNIT]
print("deploy unit: w_int", None if d.w_int is None else d.w_int.dtype,
      "w_fp", None if d.w_fp is None else d.w_fp.dtype,
      "w_groups", None if d.w_groups is None else d.w_groups.shape)
steps = deploy.act_steps_from_qstate(graph, qstate)
plan = deploy.make_deploy_plan(graph, dparams, steps, input_hw=(32, 32))
print("plan[unit]:", plan[UNIT], "| stem in int8_sites:",
      UNIT in plan["__int8_sites__"], "| biased:",
      UNIT in plan["__biased_sites__"])

# run deploy for just the first node via trace
dtrace = []
deploy.deploy_forward(graph, dparams, steps, xb, plan, trace=dtrace)
dep_out = np.asarray(dict(dtrace)[UNIT])

diff = np.abs(sim_out - dep_out)
delta = float(np.asarray(uq.aq.delta).reshape(-1)[0])
print(f"mismatch frac: {(diff > 1e-9).mean():.4f}  max/delta: "
      f"{diff.max() / delta:.2f}  mean rel: "
      f"{diff.mean() / (np.abs(sim_out).mean() + 1e-9):.4g}")

# decompose: exact f32 conv + float epilogue vs deploy conv
from shiftedscalequantization_tpu.graph import conv2d  # noqa: E402
spec = [n for n in graph if getattr(n, "name", "") == UNIT][0]
w_eff = (d.w_int if d.w_int is not None else d.w_fp).astype(jnp.float32)
acc_exact = conv2d(xb, w_eff, None, spec.stride, spec.padding, spec.groups,
                   precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
y_exact = np.asarray(acc_exact) * np.asarray(d.scale) + np.asarray(d.bias)
y_relu = np.maximum(y_exact, 0.0)
zp = float(np.asarray(uq.aq.zero_point).reshape(-1)[0])
n_bits = uq.aq.n_bits
# sim-style requant of the EXACT conv
q_sim = np.clip(np.round(y_relu / delta) + zp, 0, 2 ** n_bits - 1)
sim_style = (q_sim - zp) * delta
print("exact-conv+sim-round vs sim_out: mismatch frac",
      (np.abs(sim_style - sim_out) > 1e-9).mean())
# deploy-style requant of the EXACT conv
q_dep = np.clip(np.floor(y_relu / delta + 0.5) + zp, 0, 2 ** n_bits - 1)
dep_style = (q_dep - zp) * delta
print("exact-conv: sim-round vs floor+0.5 mismatch frac",
      (np.abs(sim_style - dep_style) > 1e-9).mean())
# how close to ties are the values?
fr = (y_relu / delta) % 1.0
print("frac of values within 1e-6 of .5 tie:",
      ((np.abs(fr - 0.5) < 1e-6)).mean())
# sim weight-quantized w vs deploy codes*scale
from shiftedscalequantization_tpu.ops import wquant as W  # noqa: E402
w_sim = np.asarray(W.apply_weight_quant(wq, params[UNIT]["w"]))
w_dep = np.asarray(w_eff) * np.asarray(d.scale).reshape(-1, 1, 1, 1)
print("weight dequant mismatch:", np.abs(w_sim - w_dep).max())
b_sim = np.asarray(params[UNIT].get("b"))
print("bias mismatch:", np.abs(b_sim - np.asarray(d.bias)).max())
