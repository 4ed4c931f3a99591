"""Multi-device scaling-efficiency report (sharded eval + recon step).

The BASELINE north star asks for images/s scaling efficiency at 1 chip /
1 host / N hosts. This harness measures the SPMD eval forward and the
sharded fused-recon step across growing data-axis sizes on whatever
devices exist (real chips on a pod slice; faked CPU devices here — where
absolute numbers are meaningless but the report format, shardings and
collectives are the real ones).

Usage: python bench_scaling.py            (uses all devices)
       SSQ_SCALING_DEVICES=1,2,4,8 BENCH_HW=32 python bench_scaling.py
Prints one JSON line with per-size throughput + efficiency vs 1 device.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("SSQ_SCALING_PLATFORM", "cpu") != "real":
    # default: faked 8-device CPU mesh (a single tunneled chip can't form a
    # mesh, and its async dispatch makes host timing meaningless — see
    # CLAUDE.md). Set SSQ_SCALING_PLATFORM=real on an actual pod slice.
    # Must run before ANY device query (backend init is sticky).
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu.graph import Flags
from shiftedscalequantization_tpu.models import resnet
from shiftedscalequantization_tpu.parallel import make_mesh, shard_batch
from jax.sharding import NamedSharding, PartitionSpec as P


def main():
    hw = int(os.environ.get("BENCH_HW", 32))
    per_dev_batch = int(os.environ.get("BENCH_PER_DEV_BATCH", 32))
    sizes = [int(s) for s in os.environ.get(
        "SSQ_SCALING_DEVICES", "1,2,4,8").split(",")
        if int(s) <= jax.device_count()]

    graph = resnet.build_resnet(18, num_classes=10,
                                variant="cifar" if hw == 32 else "imagenet")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    flags = Flags().all_weights(graph)

    rows = {}
    base_ips = None
    for n in sizes:
        mesh = make_mesh(n_data=n, n_model=1)
        batch = per_dev_batch * n
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, hw, hw, 3))
        with mesh:
            xs = shard_batch(x, mesh)
            ps = jax.device_put(params, NamedSharding(mesh, P()))
            qs = jax.device_put(qstate, NamedSharding(mesh, P()))
            fwd = jax.jit(lambda p, q, v: ssq.forward(graph, p, q, v, flags))
            jax.block_until_ready(fwd(ps, qs, xs))
            t0 = time.perf_counter()
            for _ in range(10):
                out = fwd(ps, qs, xs)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 10
        ips = batch / dt
        if base_ips is None:
            base_ips = ips
        rows[n] = {"images_per_sec": round(ips, 1),
                   "efficiency": round(ips / (base_ips * n), 3)}
    print(json.dumps({
        "metric": "sharded-eval scaling (per-device batch "
                  f"{per_dev_batch}, {hw}x{hw})",
        "platform": jax.devices()[0].platform,
        "sizes": rows,
    }))


if __name__ == "__main__":
    main()
