"""Quantized cross-device collectives for gradient reduction.

The reference's multi-GPU recon all-reduces f32 gradients every step
(Brecq/block_recon.py: link.allreduce(p.grad) per parameter). The GSPMD
equivalent moves f32 over ICI/DCN; for DCN-bound multi-host calibration
an EQuARX-style quantized all-reduce (PAPERS.md: "EQuARX: TPU-native
quantized all-reduce") cuts the wire bytes ~2.7x at the cost of ONE
bounded quantization of the gradient.

``quantized_pmean`` runs inside ``shard_map`` (it needs a named mesh
axis) and decomposes the all-reduce the EQuARX way so every hop moves
sub-f32 payloads:

  1. global amax over the axis (scalar f32 pmax — negligible)
  2. quantize to int8 codes, delta = amax / 127
  3. reduce-scatter as int8: tiled all_to_all of row chunks + local
     int32 sum (the only f32-free data exchange XLA exposes)
  4. all_gather the chunk sums as int16 (|sum of n int8| <= 127n fits
     int16 for any realistic axis size n <= 258)
  5. dequantize * delta / n

Wire traffic: N int8 + N int16 = 3 bytes/element vs ~8 (two f32 passes)
for a ring psum. The result is bit-identical on every device (same
deterministic exchange), so replicated optimizer states stay replicated.
Error: one quantization, |err| <= delta/2 = amax/254 per element.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantized_pmean(x: jax.Array, axis_name: str) -> jax.Array:
    """Mean of ``x`` across ``axis_name`` with int8 wire format.

    Must run under shard_map/pmap (needs the named axis). Falls back to
    lax.pmean for sub-lane-sized tensors where chunking cannot pay."""
    n = jax.lax.axis_size(axis_name)
    if x.size < 4 * n:
        return jax.lax.pmean(x, axis_name)
    flat = x.reshape(-1)
    amax = jax.lax.pmax(jnp.max(jnp.abs(flat)), axis_name)
    delta = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(flat / delta), -127, 127).astype(jnp.int8)
    pad = (-q.shape[0]) % n
    qp = jnp.pad(q, (0, pad)).reshape(n, -1)
    # reduce-scatter: device d ends with every peer's row d (int8 wire)
    recv = jax.lax.all_to_all(qp, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)
    part = recv.astype(jnp.int32).sum(axis=0).astype(jnp.int16)
    # gather the chunk sums back (int16 wire), restoring row order
    full = jax.lax.all_gather(part, axis_name, tiled=True)
    y = full.astype(jnp.float32)[: flat.shape[0]] * (delta / n)
    return y.reshape(x.shape).astype(x.dtype)


def pmean_tree(grads, axis_name: str, wire: str = "f32"):
    """pmean a gradient pytree with the chosen wire format.

    wire='f32' is the plain lax.pmean (what NCCL allreduce maps to);
    wire='int8' is the quantized all-reduce above."""
    if wire == "int8":
        return jax.tree.map(lambda g: quantized_pmean(g, axis_name), grads)
    if wire == "f32":
        return jax.lax.pmean(grads, axis_name)
    raise ValueError(f"unknown wire format {wire!r}")
