"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/linklink data-parallel
calibration driver (Brecq/main_imagenet_dist.py:141-271): one
``jax.sharding.Mesh`` with a ``data`` axis (calibration/eval batch
sharding — the DistributedSampler role) and a ``model`` axis (out-channel
sharding of large conv weights and their per-channel quantizer params).
Gradient reduction in the recon step is left to GSPMD: batch-mean losses
over a data-sharded batch lower to an all-reduce on ICI automatically —
the `link.allreduce(p.grad)` at block_recon.py:100-102 becomes compiler-
inserted collectives.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import UnitQuant


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, batch_sharding(mesh))


def _oc_spec(a, mesh: Mesh):
    """Shard axis 0 (out-channels) over 'model' when evenly divisible."""
    n_model = mesh.shape["model"]
    if a.ndim >= 1 and a.shape[0] % n_model == 0 and a.shape[0] >= n_model:
        return P("model", *([None] * (a.ndim - 1)))
    return P()


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Shard folded unit params: conv/linear weights and biases over their
    out-channel axis on the 'model' mesh axis; everything else replicated."""
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, _oc_spec(a, mesh)))
    return jax.tree.map(put, params)


def shard_qstate(qstate: dict, mesh: Mesh) -> dict:
    """Per-out-channel quantizer leaves follow the weights' OC sharding;
    small/irregular leaves replicate."""
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, _oc_spec(a, mesh)))
    return jax.tree.map(put, qstate)
