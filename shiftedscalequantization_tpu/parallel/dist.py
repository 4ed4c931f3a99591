"""Distributed calibration + evaluation over a device mesh.

TPU-native replacement for the reference's multi-GPU DP driver
(Brecq/main_imagenet_dist.py:141-271): instead of mp.spawn + NCCL process
groups + DistributedSampler + explicit link.allreduce(p.grad), everything
is ONE jitted SPMD program under a Mesh:

  * eval: batches sharded over the 'data' axis; the correct-count
    reduction lowers to an all-reduce over ICI (replacing the metric
    allreduce at main_imagenet_dist.py:114-124).
  * capture: the calibration set is sharded over 'data'; each capture
    forward is SPMD and the cached activations stay sharded in device
    memory (replacing per-rank calibration shards, :165).
  * reconstruction: the engine's jitted step runs under the mesh with the
    cached tensors batch-sharded; minibatch gathers and the gradient
    all-reduce are inserted by GSPMD (replacing block_recon.py:100-102).

Multi-host entry: call ``init_multihost()`` (jax.distributed.initialize)
before device queries; the same code then spans hosts with the mesh laid
out DCN(data) x ICI(model).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import Flags, Graph, forward
from .mesh import batch_sharding, make_mesh, shard_batch, shard_params, \
    shard_qstate


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None):
    """jax.distributed.initialize with env-var fallbacks. No-op when
    single-process (the common single-host case)."""
    if num_processes is None:
        num_processes = int(os.environ.get("SSQ_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ["SSQ_COORDINATOR"],
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None else int(os.environ["SSQ_PROCESS_ID"]))
    return True


def pad_to_multiple(x, m: int, axis: int = 0):
    """Pad batch axis to a multiple of the data-axis size (static shapes)."""
    n = x.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), n


def sharded_validate(graph: Graph, params, qstate, data: Iterable,
                     mesh: Mesh, flags: Flags = Flags(), topk=(1, 5)):
    """Top-k accuracy with batches sharded over mesh['data'].

    Replaces the reference's per-rank validate + allreduce
    (main_imagenet_dist.py:82-124): the jitted program computes sharded
    logits and reduces correct-counts across the mesh automatically.
    """
    n_data = mesh.shape["data"]
    maxk = max(topk)

    @partial(jax.jit, static_argnames=())
    def batch_correct(params, qstate, xb, yb, valid):
        logits = forward(graph, params, qstate, xb, flags)
        _, pred = jax.lax.top_k(logits, maxk)
        hit = (pred == yb[:, None]) & valid[:, None]
        return jnp.stack([hit[:, :k].any(axis=1).sum() for k in topk])

    totals = np.zeros(len(topk), np.int64)
    n = 0
    with mesh:
        for xb, yb in data:
            xb = jnp.asarray(xb)
            yb = jnp.asarray(yb)
            n += xb.shape[0]
            xb, real = pad_to_multiple(xb, n_data)
            yb, _ = pad_to_multiple(yb, n_data)
            valid = jnp.arange(xb.shape[0]) < real
            xb = shard_batch(xb, mesh)
            yb = jax.device_put(yb, batch_sharding(mesh))
            valid = jax.device_put(valid, batch_sharding(mesh))
            totals += np.asarray(batch_correct(params, qstate, xb, yb, valid))
    return {f"top{k}": 100.0 * totals[i] / max(n, 1)
            for i, k in enumerate(topk)}


def sharded_capture(graph: Graph, params, qstate, target: str, cali_data,
                    mesh: Mesh, inp_flags: Flags, out_flags: Flags,
                    batch_size: int = 64):
    """capture_io with the calibration set sharded over mesh['data'];
    returns batch-sharded cached activations (they never leave the mesh)."""
    from ..recon.capture import capture_io
    n_data = mesh.shape["data"]
    with mesh:
        cali, _ = pad_to_multiple(jnp.asarray(cali_data), n_data)
        cali = shard_batch(cali, mesh)
        return capture_io(graph, params, qstate, target, cali,
                          inp_flags, out_flags, batch_size=batch_size)


def synced_calibrate_acts(graph: Graph, params, qstate, cali_data, cfg,
                          mesh: Mesh, axis: str = "data",
                          flags: Optional[Flags] = None):
    """Activation-scale calibration with cross-rank statistic sync.

    The reference stubs this as ``synchorize_activation_statistics``
    (quant/quant_model.py:78-83, linklink allreduce of act-quantizer
    scales, commented out at the dist-driver call site) — every DP rank
    calibrates on its own shard, then the per-site scale statistics are
    reconciled by an all-reduce MEAN so all ranks quantize identically.

    TPU-native form: ONE shard_map program over ``mesh[axis]`` — each
    shard runs the same single-pass lazy-init interpreter walk
    (graph.init_act_quant) on its slice of the calibration batch, then
    delta / zero_point are lax.pmean'd over the axis (zero_point
    re-rounded to stay integral). Returns a new qstate identical on all
    ranks."""
    import dataclasses as _dc

    from jax.experimental.shard_map import shard_map

    from ..graph import UnitQuant, init_act_quant
    from ..quantize import act_quant_sites

    if flags is None:
        flags = Flags().all_weights(graph)
    sites = act_quant_sites(graph, cfg, disable_output_quant=True)
    n_shards = mesh.shape[axis]
    cali, _ = pad_to_multiple(jnp.asarray(cali_data), n_shards)

    def shard_fn(p, qs, x):
        new_aq = init_act_quant(graph, p, qs, x, flags, sites,
                                act_sym=False,
                                scale_method=cfg.a_scale_method)
        out = {}
        for name, qp in new_aq.items():
            delta = jax.lax.pmean(qp.delta, axis)
            zp = jnp.round(jax.lax.pmean(
                qp.zero_point.astype(jnp.float32), axis))
            out[name] = _dc.replace(qp, delta=delta, zero_point=zp)
        return out

    spec_x = P(axis)
    with mesh:
        new_aq = jax.jit(shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), spec_x), out_specs=P(),
            check_rep=False))(params, qstate, cali)
    qstate = dict(qstate)
    for name, qp in new_aq.items():
        if name in qstate and isinstance(qstate[name], UnitQuant):
            qstate[name] = _dc.replace(qstate[name], aq=qp)
        else:
            qstate[name] = qp
    return qstate


def sharded_reconstruct(graph: Graph, params, qstate, node_name: str,
                        cached_inp, cached_out, settings, key, mesh: Mesh):
    """Run the reconstruction engine under the mesh: params/qstate sharded
    over out-channels on 'model', cache batch-sharded on 'data'; the jitted
    step's gradient reduction is GSPMD-inserted."""
    from ..recon.engine import reconstruct_node
    with mesh:
        params = shard_params(params, mesh)
        qstate = shard_qstate(qstate, mesh)
        return reconstruct_node(graph, params, qstate, node_name,
                                cached_inp, cached_out, settings, key)


def ddp_reconstruct(graph: Graph, params, qstate, node_name: str,
                    cached_inp, cached_out, settings, key, mesh: Mesh,
                    wire: str = "f32", cached_grads=None):
    """Explicit-collective DDP reconstruction (the reference's multi-GPU
    recon shape: per-rank minibatches + an all-reduce of gradients,
    Brecq/block_recon.py link.allreduce — here one shard_map program).

    The recon chunk runs under shard_map over mesh['data'] with the cache
    batch-sharded; every device samples its LOCAL minibatch of
    batch_size // n rows and the gradient is all-reduced with the chosen
    wire format: 'f32' (lax.pmean — the NCCL-allreduce equivalent) or
    'int8' (EQuARX-style quantized all-reduce, parallel/collectives —
    ~2.7x fewer wire bytes for DCN-bound multi-host calibration).

    sharded_reconstruct is the implicit twin (GSPMD inserts the
    collectives, always f32); this one exists to control the wire."""
    import dataclasses

    from jax import shard_map

    from ..recon.engine import _recon_chunk_jit, reconstruct_node

    n = mesh.shape["data"]
    s = dataclasses.replace(settings, grad_psum_axis="data", grad_wire=wire,
                            batch_size=max(settings.batch_size // n, 1))
    with mesh:
        ci, _ = pad_to_multiple(jnp.asarray(cached_inp), n)
        ci = shard_batch(ci, mesh)
        co, _ = pad_to_multiple(jnp.asarray(cached_out), n)
        co = shard_batch(co, mesh)
        cg = None
        if cached_grads is not None:
            cg, _ = pad_to_multiple(jnp.asarray(cached_grads), n)
            cg = shard_batch(cg, mesh)

        def runner(node_c, s_, flags_c, p_norm, nsteps, theta, opt, key_,
                   t0, params_sub, qstate_sub, ci_, co_, cg_):
            fn = shard_map(
                partial(_recon_chunk_jit, node_c, s_, flags_c, p_norm,
                        nsteps),
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(), P(),
                          P("data"), P("data"), P("data")),
                out_specs=(P(), P(), P()),
                check_vma=False)
            return fn(theta, opt, key_, t0, params_sub, qstate_sub,
                      ci_, co_, cg_)

        return reconstruct_node(graph, params, qstate, node_name, ci, co,
                                s, key, cached_grads=cg,
                                chunk_runner=runner)
