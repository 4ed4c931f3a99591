"""Pallas TPU kernel: fused quantize -> int8 matmul -> dequant epilogue.

The deploy-mode hot op for linear layers and 1x1 convolutions (reshaped
NHWC -> (N*H*W, C)): quantizes the float activation tile to centered int8
codes in VMEM, runs the int8 x int8 -> int32 contraction on the MXU, and
applies the per-out-channel dequant scale + bias (+ optional ReLU) before
writing back — one HBM round trip instead of three (quantize, matmul,
epilogue).

K is kept whole per tile (CNN channel counts fit VMEM easily: K <= 2048
-> 2048*TM bytes int8 per operand tile), so no accumulator carry across
grid steps is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _qmm_kernel(x_ref, w_ref, scale_ref, bias_ref, qp_ref, out_ref, *, relu):
    """x (TM, K) f32; w (K, TN) int8; scale/bias (1, TN) f32;
    qp (1, 4) f32 = [act_delta, act_zp, act_lo, act_hi]."""
    delta = qp_ref[0, 0]
    zp = qp_ref[0, 1]
    lo = qp_ref[0, 2]
    hi = qp_ref[0, 3]
    x = x_ref[:]
    # NB: pl.reciprocal on an SMEM scalar miscompiles in Mosaic (jax 0.9);
    # plain division lowers fine
    q = jnp.clip(jnp.round(x / delta) + zp, lo, hi) - zp
    xi = q.astype(jnp.int8)
    acc = jax.lax.dot_general(
        xi, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (scale_ref[:] * delta) + bias_ref[:]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("relu", "interpret", "tm", "tn"))
def quant_matmul(x, w_int8_kn, scale_n, bias_n, act_delta, act_zp,
                 act_n_bits: int = 4, relu: bool = False,
                 interpret: bool = False, tm: int = 256, tn: int = 256):
    """y = relu?(dequant(int8mm(quant(x), w)) * scale + bias).

    x: (M, K) float32 (pre-quant activation, already on the act grid or not
    — the kernel quantizes). w_int8_kn: (K, N) centered int8 codes.
    scale_n/bias_n: (N,) epilogue. act grid: delta/zp scalars.
    """
    m, k = x.shape
    n = w_int8_kn.shape[1]
    tm = min(tm, max((m // 8) * 8, 8)) if m >= 8 else m
    tn = min(tn, n)
    qp = jnp.stack([
        jnp.asarray(act_delta, jnp.float32).reshape(()),
        jnp.asarray(act_zp, jnp.float32).reshape(()),
        jnp.float32(0.0),
        jnp.float32(2 ** act_n_bits - 1),
    ]).reshape(1, 4)
    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn))
    return pl.pallas_call(
        functools.partial(_qmm_kernel, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 4 + k * n + m * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, w_int8_kn, scale_n.reshape(1, -1), bias_n.reshape(1, -1), qp)


def quant_conv1x1(x_nhwc, w_int8_oi, scale, bias, act_delta, act_zp,
                  act_n_bits: int = 4, stride=(1, 1), relu: bool = False,
                  interpret: bool = False):
    """1x1 conv as the fused quant matmul. w_int8_oi: (O, I) int8."""
    if stride != (1, 1):
        x_nhwc = x_nhwc[:, :: stride[0], :: stride[1], :]
    n, h, w_, c = x_nhwc.shape
    y = quant_matmul(x_nhwc.reshape(-1, c), w_int8_oi.T, scale, bias,
                     act_delta, act_zp, act_n_bits, relu=relu,
                     interpret=interpret)
    return y.reshape(n, h, w_, -1)
