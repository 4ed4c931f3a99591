"""Pallas TPU kernel: fused int8 depthwise 3x3 conv -> act quant.

The reference runs MobileNetV2's depthwise convs as grouped F.conv2d
(models/mobilenetv2.py:37-44, fake-quant wrappers quant_layer.py:245-280).
On TPU a depthwise conv is the MXU worst case — each output channel
contracts over a single input channel, so the 128x128 systolic array runs
at 1/128 utilization; XLA's grouped-conv lowering made the int deploy path
*slower* than bf16 on MobileNetV2 (BENCHMARKS.md: 0.58x).

This kernel keeps the depthwise conv where it belongs: the VPU. Channels
sit on lanes (NHWC), the 3x3 taps become nine shifted multiply-accumulates
(row shifts are free leading-dim slices, col shifts are sublane shifts),
and the whole unit is fused end to end:

    int8 codes in -> 9 VPU MACs (f32, exact: |acc| < 2^24) ->
    per-channel dequant epilogue -> relu/relu6 -> requantize -> int8 out

so a depthwise unit costs ONE HBM round trip of int8 codes (4x less
traffic than the f32 fake-quant path) and zero MXU time.

Accumulation exactness: products code_x * code_w with |code_x| <= 128,
|code_w| <= 255, 9 taps -> |acc| <= 294k < 2^24, exactly representable in
f32 — the kernel is bit-identical to an integer conv.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, w_ref, sb_ref, qp_ref, out_ref, xp_ref, *,
               h, w, c, act):
    """One image. x (1,H,W,C) int8; w (9,C) f32 codes; sb (2,C) f32
    [scalef, biasf]; qp (1,3) SMEM [inv_delta_out, zp_out, qmax];
    out (1,Ho,Wo,C) int8; scratch xp (H+2,W+2,C) f32.

    The MAC/epilogue runs in row chunks: a full-plane (H, W, C) f32
    vector value spills the VMEM stack at real shapes (112x112x32 padded
    to 128 lanes is 6.4 MB per live temporary — Mosaic OOMs), while an
    8-row chunk keeps every live vector under ~0.5 MB."""
    xp_ref[...] = jnp.zeros((h + 2, w + 2, c), jnp.float32)
    xp_ref[1:h + 1, 1:w + 1, :] = x_ref[0].astype(jnp.float32)

    rc_full = min(8, h)
    for r0 in range(0, h, rc_full):
        rc = min(rc_full, h - r0)
        acc = xp_ref[r0:r0 + rc, 0:w, :] * w_ref[0]
        for k in range(1, 9):
            di, dj = divmod(k, 3)
            acc += xp_ref[r0 + di:r0 + di + rc, dj:dj + w, :] * w_ref[k]
        y = acc * sb_ref[0] + sb_ref[1]
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "relu6":
            y = jnp.clip(y, 0.0, 6.0)
        # requantize onto the unit's own act grid; plain division
        # (CLAUDE.md: pl.reciprocal on SMEM scalars miscompiles)
        q = jnp.clip(jnp.round(y * qp_ref[0, 0]) + qp_ref[0, 1], 0.0,
                     qp_ref[0, 2])
        codes = q - qp_ref[0, 1]
        out_ref[0, r0:r0 + rc] = codes.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("stride", "act", "interpret"))
def dw_conv3x3_int8(x_codes, w_codes_c33, scalef_c, biasf_c,
                    out_delta, out_zp, out_qmax,
                    stride: int = 1, act: str = "relu6",
                    interpret: bool = False):
    """Fused depthwise 3x3 (pad 1) on centered int8 activation codes.

    x_codes: (B, H, W, C) int8 centered codes (value = codes * delta_in).
    w_codes_c33: (C, 3, 3) centered integer weight codes (int8 range).
    scalef_c: (C,) f32 = delta_in * delta_w_c * alpha_out_c — dequant of
        the integer accumulator. biasf_c: (C,) folded bias.
    out_delta/out_zp/out_qmax: the unit's own act grid (scalars).
    Returns (B, Ho, Wo, C) centered int8 codes on that grid.
    """
    b, h, w, c = x_codes.shape
    wt = jnp.transpose(w_codes_c33.astype(jnp.float32), (1, 2, 0)) \
        .reshape(9, c)
    sb = jnp.stack([scalef_c.astype(jnp.float32),
                    biasf_c.astype(jnp.float32)])
    qp = jnp.stack([1.0 / jnp.asarray(out_delta, jnp.float32).reshape(()),
                    jnp.asarray(out_zp, jnp.float32).reshape(()),
                    jnp.asarray(out_qmax, jnp.float32).reshape(())]
                   ).reshape(1, 3)
    kern = functools.partial(_dw_kernel, h=h, w=w, c=c, act=act)
    out = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * 9,
            bytes_accessed=b * 2 * h * w * c,
            transcendentals=0),
        interpret=interpret,
    )(x_codes, wt, sb, qp)
    if stride != 1:
        # stride-2 subsample OUTSIDE the kernel: XLA strided-slices int8
        # at near-bandwidth, while Mosaic's in-kernel lane reshapes reject
        # sub-128 widths. 4x compute waste, but only MobileNetV2's four
        # stride-2 dw layers pay it.
        out = out[:, ::stride, ::stride, :]
    return out
