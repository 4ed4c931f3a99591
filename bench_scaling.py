"""Multi-device scaling-efficiency report (eval + capture + DDP recon).

The BASELINE north star asks for images/s scaling efficiency at 1 chip /
1 host / N hosts. This harness measures, per data-axis size:

  - sharded eval forward (images/s + efficiency vs 1 device)
  - sharded calibration capture (capture_io over the data axis)
  - explicit-DDP reconstruction chunks (the reference's multi-GPU recon
    shape, Brecq/main_imagenet_dist.py:141-271 + block_recon.py:100-102)
    at BOTH gradient wire formats: f32 (lax.pmean = NCCL allreduce) and
    int8 (EQuARX-style quantized all-reduce), with per-step wire bytes.

On the faked CPU mesh absolute numbers are meaningless but the report
format, shardings and collectives are the real ones; relative step-time
ratios show the collective structure's cost. Set
SSQ_SCALING_PLATFORM=real on an actual pod slice.

Usage: python bench_scaling.py [out.json]
Env: SSQ_SCALING_DEVICES=1,2,4,8  BENCH_HW=32  BENCH_PER_DEV_BATCH=32
     SSQ_SCALING_ITERS=40 (recon iters per timing)
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
    # CLAUDE.md). Must run before ANY device query (backend init sticky).
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu.graph import Flags
from shiftedscalequantization_tpu.models import resnet
from shiftedscalequantization_tpu.parallel import make_mesh, shard_batch
from shiftedscalequantization_tpu.parallel import dist
from shiftedscalequantization_tpu.quantize import act_flags
from shiftedscalequantization_tpu.recon import ReconSettings
from jax.sharding import NamedSharding, PartitionSpec as P


def _timed(fn, *args, reps=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    hw = int(os.environ.get("BENCH_HW", 32))
    per_dev_batch = int(os.environ.get("BENCH_PER_DEV_BATCH", 32))
    recon_iters = int(os.environ.get("SSQ_SCALING_ITERS", 40))
    sizes = [int(s) for s in os.environ.get(
        "SSQ_SCALING_DEVICES", "1,2,4,8").split(",")
        if int(s) <= jax.device_count()]
    node = "model.layer2.0"

    graph = resnet.build_resnet(18, num_classes=10,
                                variant="cifar" if hw == 32 else "imagenet")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    flags = Flags().all_weights(graph)

    # grad wire bytes per DDP step: every step all-reduces d(loss)/d(theta)
    # for the node's alpha logits. int8 wire = 3 B/elem (int8 out + int16
    # back, collectives.py docstring); f32 ring psum ~ 8 B/elem.
    from shiftedscalequantization_tpu.graph import find_node, node_unit_names
    n_grad_elems = sum(
        int(jnp.size(params[u]["w"])) for u in
        node_unit_names(find_node(graph, node)))

    rows = {}
    base = {}
    for n in sizes:
        mesh = make_mesh(n_data=n, n_model=1)
        batch = per_dev_batch * n
        x = jax.random.normal(jax.random.PRNGKey(1), (batch, hw, hw, 3))
        row = {}
        with mesh:
            xs = shard_batch(x, mesh)
            ps = jax.device_put(params, NamedSharding(mesh, P()))
            qs = jax.device_put(qstate, NamedSharding(mesh, P()))
            fwd = jax.jit(lambda p, q, v: ssq.forward(graph, p, q, v, flags))
            dt = _timed(fwd, ps, qs, xs)
        row["eval_images_per_sec"] = round(batch / dt, 1)

        # sharded capture of one block (calibration set over mesh['data'])
        cali = jax.random.normal(jax.random.PRNGKey(2), (batch, hw, hw, 3))
        t0 = time.perf_counter()
        ci, co = dist.sharded_capture(graph, params, qstate, node, cali,
                                      mesh, flags, Flags(),
                                      batch_size=per_dev_batch)
        jax.block_until_ready((ci, co))
        row["capture_s"] = round(time.perf_counter() - t0, 3)

        # explicit-DDP recon: iters fixed, per-device minibatch = 32/n
        for wire in ("f32", "int8"):
            s = ReconSettings(mode="fused", iters=recon_iters,
                              batch_size=32, chunk=recon_iters)
            t0 = time.perf_counter()
            _, m = dist.ddp_reconstruct(graph, params, qstate, node, ci, co,
                                        s, jax.random.PRNGKey(3), mesh,
                                        wire=wire)
            jax.block_until_ready(m["rec_trace"])
            row[f"ddp_recon_{wire}_s_per_iter"] = round(
                (time.perf_counter() - t0) / recon_iters, 4)
            row[f"ddp_recon_{wire}_hard"] = round(float(m["hard_loss"]), 4)
        row["wire_bytes_per_step_f32"] = 8 * n_grad_elems if n > 1 else 0
        row["wire_bytes_per_step_int8"] = 3 * n_grad_elems if n > 1 else 0

        if not base:
            base = dict(row)
        row["eval_efficiency"] = round(
            row["eval_images_per_sec"] / (base["eval_images_per_sec"] * n), 3)
        rows[n] = row

    report = {
        "metric": f"scaling report (per-device batch {per_dev_batch}, "
                  f"{hw}x{hw}, recon node {node})",
        "platform": jax.devices()[0].platform,
        "recon_iters": recon_iters,
        "grad_elems": n_grad_elems,
        "sizes": rows,
    }
    print(json.dumps(report))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
