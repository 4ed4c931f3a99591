"""Pallas TPU kernel: fused MobileNetV2 inverted-residual block (int8 I/O).

The reference runs each MBConv block as three separate fake-quant conv
modules (models/mobilenetv2.py:25-58, quant wrappers quant_layer.py), so
every stage round-trips activations through HBM. On TPU the block is
bandwidth-bound: for features.2 at batch 256 the expand output alone is
616 MB of bf16 traffic per direction. This kernel keeps the whole block
VMEM-resident:

    int8 block-input codes ->
      [expand 1x1 matmul on the MXU (bf16-exact integer codes, f32 acc)]
      -> folded relu6+requant epilogue (floor-round) ->
      depthwise 3x3 as nine static-shift VPU FMAs (f32, exact) ->
      folded relu6+requant ->
      project 1x1 matmul (MXU) -> [+ residual] -> block-site requant
    -> int8 block-output codes

so a stride-1 block costs ONE int8 read + ONE int8 write of HBM. The
arithmetic is bit-identical to the deploy bf16_codes path with
_round_act (floor(x+0.5)) epilogues: all operands are small integer
codes (bf16-exact), accumulations stay < 2^24, and relu6+requant clips
are folded into single per-stage clip bounds (monotonicity of floor).

Stride-2 blocks are NOT handled (stride-2 column selection is a lane-dim
gather Mosaic cannot express cheaply); they stay on the XLA path. See
BENCHMARKS.md MobileNetV2 section for measurements.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mbconv_kernel(x_ref, we_ref, ae_ref, wd_ref, ad_ref, wp_ref, ap_ref,
                   qp_ref, out_ref, zp_ref, q2_ref, *,
                   h, w, ci, ce, co, has_expand, has_residual):
    """One image.

    x (1,H,W,CI) int8 centered codes; we (CI,CE) bf16 integer codes;
    ae (2,CE) f32 [A_e, B_e] folded epilogue (A=scale*inv_delta,
    B=bias*inv_delta+0.5 — the +0.5 makes floor a round);
    wd (9,CE) f32 dw codes; ad (2,CE) f32; wp (CE,CO) bf16 codes;
    ap (2,CO) f32; qp (1,6) SMEM [hi_e, hi_d, res_scale, lo_o, hi_o, -]
    (hi_* = folded relu6+qmax upper clips on centered codes; lo_o/hi_o
    the block-site centered clip range); out (1,H,W,CO) int8.
    Scratch: zp (H+2, W+2, CE) f32 zero-padded dw input; q2 (H*W, CE)
    f32 dw output codes (flattened for the project matmul).
    """
    hi_e = qp_ref[0, 0]
    hi_d = qp_ref[0, 1]
    r_s = qp_ref[0, 2]
    lo_o = qp_ref[0, 3]
    hi_o = qp_ref[0, 4]

    # ---- expand 1x1 (MXU) + folded relu6/requant -> zp interior -------
    zp_ref[...] = jnp.zeros((h + 2, w + 2, ce), jnp.float32)
    xc = x_ref[0].astype(jnp.bfloat16).reshape(h * w, ci)
    if has_expand:
        acc = jax.lax.dot_general(
            xc, we_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (h*w, CE)
        q1 = jnp.clip(jnp.floor(acc * ae_ref[0] + ae_ref[1]), 0.0, hi_e)
    else:
        # expand_ratio == 1: the dw consumes the block input directly
        q1 = x_ref[0].astype(jnp.float32).reshape(h * w, ce)
    zp_ref[1:h + 1, 1:w + 1, :] = q1.reshape(h, w, ce)

    # ---- depthwise 3x3 (VPU, row-chunked) + folded relu6/requant ------
    rc_full = min(8, h)
    for r0 in range(0, h, rc_full):
        rc = min(rc_full, h - r0)
        acc = zp_ref[r0:r0 + rc, 0:w, :] * wd_ref[0]
        for k in range(1, 9):
            di, dj = divmod(k, 3)
            acc += zp_ref[r0 + di:r0 + di + rc, dj:dj + w, :] * wd_ref[k]
        q2 = jnp.clip(jnp.floor(acc * ad_ref[0] + ad_ref[1]), 0.0, hi_d)
        q2_ref[r0 * w:(r0 + rc) * w, :] = q2.reshape(rc * w, ce)

    # ---- project 1x1 (MXU) + residual + block-site requant ------------
    accp = jax.lax.dot_general(
        q2_ref[...].astype(jnp.bfloat16), wp_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (h*w, CO)
    y = accp * ap_ref[0] + ap_ref[1]
    if has_residual:
        y = y + xc.astype(jnp.float32) * r_s
    q = jnp.clip(jnp.floor(y), lo_o, hi_o)
    out_ref[0] = q.reshape(h, w, co).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("has_expand", "has_residual",
                                             "interpret"))
def mbconv_fused(x_codes, we, ae, wd, ad, wp, ap, qp,
                 has_expand: bool = True, has_residual: bool = True,
                 interpret: bool = False):
    """Fused stride-1 inverted-residual block on centered int8 codes.

    x_codes: (B, H, W, CI) int8. we: (CI, CE) bf16 integer expand codes
    (pass a dummy (CI, CE) when has_expand=False with CE == CI).
    ae/ad/ap: (2, C) f32 folded epilogue rows [A, B] (see kernel doc).
    wd: (9, CE) f32 dw codes, tap-major. wp: (CE, CO) bf16 project codes.
    qp: (1, 6) f32 scalars [hi_e, hi_d, res_scale, lo_o, hi_o, 0].
    Returns (B, H, W, CO) centered int8 codes on the block's act grid.
    """
    b, h, w, ci = x_codes.shape
    ce = wd.shape[1]
    co = wp.shape[1]
    kern = functools.partial(_mbconv_kernel, h=h, w=w, ci=ci, ce=ce, co=co,
                             has_expand=has_expand,
                             has_residual=has_residual)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const(ci, ce), const(2, ce),
            const(9, ce), const(2, ce),
            const(ce, co), const(2, co),
            pl.BlockSpec((1, 6), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, ce), jnp.float32),
            pltpu.VMEM((h * w, ce), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * (ci * ce + 9 * ce + ce * co),
            bytes_accessed=b * h * w * (ci + co),
            transcendentals=0),
        interpret=interpret,
    )(x_codes, we, ae, wd, ad, wp, ap, qp)
