"""Measure logit drift of the 1-pass bf16 stem vs the exact 2-pass split.

Runs the bench config (ResNet-18 ImageNet W2A4, random weights, max-calib)
and compares deploy_forward logits under SSQ_STEM_1PASS=0/1 against the
sim-mode forward. Drift here is pure stem-activation bf16 rounding — the
weights are integer codes and bf16-exact.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache_axon", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu import deploy
from shiftedscalequantization_tpu.models import resnet, zoo
from shiftedscalequantization_tpu.quantize import act_flags

cpu = jax.local_devices(backend="cpu")[0]
tpu = jax.devices()[0]
with jax.default_device(cpu):
    graph, _ = zoo.build("resnet18", dataset="imagenet")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max",
                          a_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    calib = jax.random.normal(jax.random.PRNGKey(1), (16, 224, 224, 3))
    qstate = ssq.calibrate_acts(graph, params, qstate, calib, cfg)
    dparams = deploy.build_deploy_params(graph, params, qstate)
    steps = deploy.act_steps_from_qstate(graph, qstate)
    flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
    x = jax.random.normal(jax.random.PRNGKey(2), (32, 224, 224, 3))

    os.environ["SSQ_STEM_1PASS"] = "0"
    plan2 = deploy.make_deploy_plan(graph, dparams, steps)
    os.environ["SSQ_STEM_1PASS"] = "1"
    plan1 = deploy.make_deploy_plan(graph, dparams, steps)
    assert plan1 != plan2, "1-pass plan did not change"

put = lambda t: jax.device_put(t, tpu)
params, qstate, dparams, steps, x = jax.tree.map(
    put, (params, qstate, dparams, steps, x))

sim = jax.jit(lambda x: ssq.forward(graph, params, qstate, x, flags))
dep2 = jax.jit(lambda x: deploy.deploy_forward(graph, dparams, steps, x,
                                               plan=plan2))
dep1 = jax.jit(lambda x: deploy.deploy_forward(graph, dparams, steps, x,
                                               plan=plan1))

s, d2, d1 = jax.device_get((sim(x), dep2(x), dep1(x)))

import numpy as np


def rel(a, b):
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def agree(a, b):
    return float(np.mean(np.argmax(a, -1) == np.argmax(b, -1)))


print("rel(dep2, sim)  =", rel(d2, s), " argmax agree:", agree(d2, s))
print("rel(dep1, sim)  =", rel(d1, s), " argmax agree:", agree(d1, s))
print("rel(dep1, dep2) =", rel(d1, d2), " argmax agree:", agree(d1, d2))
