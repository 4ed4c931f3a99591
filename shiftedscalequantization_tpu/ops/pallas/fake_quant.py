"""Pallas TPU kernel: fused per-channel uniform fake-quant.

Sim-mode hot op (the reference computes it as ~6 separate torch ops,
quant_layer.py:92-98). One VPU pass: scale, round, clamp, dequant —
no intermediate HBM traffic. Used for weight fake-quant of large conv
weights and activation fake-quant where XLA's fusion is beaten by
keeping everything in VMEM.

The kernel is rank-2: callers reshape (OC, IC*KH*KW) for per-out-channel
weight quant (delta shaped (OC, 1)) or (N*H*W, C) with scalar delta for
per-tensor act quant.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fake_quant_kernel(x_ref, delta_ref, zp_ref, out_ref, *, lo, hi):
    x = x_ref[:]
    delta = delta_ref[:]
    zp = zp_ref[:]
    inv = 1.0 / delta
    q = jnp.clip(jnp.round(x * inv) + zp, lo, hi)
    out_ref[:] = (q - zp) * delta


def _pick_tile(n, cap, align):
    t = min(n, cap)
    return max((t // align) * align, min(n, align))


@functools.partial(jax.jit, static_argnames=("lo", "hi", "interpret"))
def fake_quant_2d(x, delta, zp, lo: int, hi: int, interpret: bool = False):
    """Fused fake-quant on a 2D tensor.

    x: (R, C) float32. delta/zp: (R, 1) per-row or (1, 1) scalar.
    Returns fake-quantized x.
    """
    r, c = x.shape
    tile_r = _pick_tile(r, 256, 8)
    tile_c = _pick_tile(c, 512, 128)
    grid = (pl.cdiv(r, tile_r), pl.cdiv(c, tile_c))
    per_row = delta.shape[0] == r and r > 1

    if per_row:
        d_spec = pl.BlockSpec((tile_r, 1), lambda i, j: (i, 0),
                              memory_space=pltpu.VMEM)
    else:
        d_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fake_quant_kernel, lo=float(lo), hi=float(hi)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, tile_c), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            d_spec, d_spec,
        ],
        out_specs=pl.BlockSpec((tile_r, tile_c), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        interpret=interpret,
    )(x, delta, zp)


def fake_quant_weight(w, delta, zp, n_bits: int, sym: bool,
                      interpret: bool = False):
    """Per-out-channel weight fake-quant via the Pallas kernel.

    w: (OC, ...) any rank; delta/zp: (OC, 1)-broadcastable.
    """
    n = 2 ** n_bits
    lo, hi = (-(n // 2), n // 2 - 1) if sym else (0, n - 1)
    oc = w.shape[0]
    flat = w.reshape(oc, -1)
    d = jnp.broadcast_to(jnp.asarray(delta).reshape(-1, 1), (oc, 1))
    z = jnp.broadcast_to(jnp.asarray(zp).reshape(-1, 1), (oc, 1))
    out = fake_quant_2d(flat, d, z, lo, hi, interpret=interpret)
    return out.reshape(w.shape)


def fake_quant_act(x, delta, zp, n_bits: int, interpret: bool = False):
    """Per-tensor activation fake-quant (NHWC or (N, C)) via Pallas."""
    lo, hi = 0, 2 ** n_bits - 1
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    d = jnp.reshape(jnp.asarray(delta, x.dtype), (1, 1))
    z = jnp.reshape(jnp.asarray(zp, x.dtype), (1, 1))
    out = fake_quant_2d(flat, d, z, lo, hi, interpret=interpret)
    return out.reshape(shape)
