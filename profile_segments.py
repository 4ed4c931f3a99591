"""Ad-hoc per-segment profiler for the int8 deploy path vs bf16.

Times deploy_forward / bf16 forward on graph prefixes (cumulative) to
localize where the e2e ms/batch goes. Not part of the test suite.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache_axon", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu import deploy
from shiftedscalequantization_tpu.models import resnet, zoo
from bench import time_fn

batch = int(os.environ.get("BENCH_BATCH", 256))
iters = int(os.environ.get("BENCH_ITERS", 20))
hw = 224
arch = os.environ.get("BENCH_ARCH", "resnet18")

cpu = jax.local_devices(backend="cpu")[0]
tpu = jax.devices()[0]
with jax.default_device(cpu):
    graph, _ = zoo.build(arch, dataset="imagenet")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max",
                          a_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    calib = jax.random.normal(jax.random.PRNGKey(1), (16, hw, hw, 3))
    qstate = ssq.calibrate_acts(graph, params, qstate, calib, cfg)
    dparams = deploy.build_deploy_params(graph, params, qstate)
    steps = deploy.act_steps_from_qstate(graph, qstate)
    plan = deploy.make_deploy_plan(graph, dparams, steps)
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(2), (batch, hw, hw, 3))

put = lambda t: jax.device_put(t, tpu)
params_bf16, qstate, dparams, steps, x = jax.tree.map(
    put, (params_bf16, qstate, dparams, steps, x))

names = [getattr(n, "name", type(n).__name__) for n in graph]
print("nodes:", names)

# prefix cut points: after stem conv+pool, then after each block-ish node
cuts = []
for i in range(1, len(graph) + 1):
    cuts.append(i)

prev_q = prev_f = 0.0
for i in cuts:
    sub = graph[:i]
    try:
        q_fn = lambda xx: deploy.deploy_forward(sub, dparams, steps, xx, plan)
        q_t = time_fn(q_fn, x, iters) * 1e3
    except Exception as e:
        print(f"{i:2d} {names[i-1]:<14s} int8 FAIL {str(e)[:80]}")
        continue
    f_fn = lambda xx: ssq.forward(sub, params_bf16, qstate,
                                  xx.astype(jnp.bfloat16), ssq.Flags())
    f_t = time_fn(f_fn, x, iters) * 1e3
    print(f"{i:2d} {names[i-1]:<14s} int8 {q_t:6.2f} (+{q_t-prev_q:5.2f})  "
          f"bf16 {f_t:6.2f} (+{f_t-prev_f:5.2f})")
    prev_q, prev_f = q_t, f_t
