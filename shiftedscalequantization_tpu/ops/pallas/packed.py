"""Packed sub-byte weight storage + Pallas unpack-matmul kernel.

W2/W4 weight codes stored 16/8-per-int32 (the int-packing item of
SURVEY.md §7 step 7): HBM-resident weights shrink 4x/2x vs int8 and are
unpacked on the fly in VMEM — `pltpu.repeat` + shift + mask, no gathers —
then fed to the int8 MXU with the same fused quantize/dequant epilogue as
ops/pallas/int_matmul.

Packing layout: RAW (unsigned) codes q in [0, 2^bits), K-contiguous groups
of f = 32//bits codes per int32 word, shape (ceil(K/f), N). The per-column
zero point is subtracted after unpacking (centered int8 codes), so
asymmetric weights pack at their nominal bit width.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_codes(q: jax.Array, bits: int) -> jax.Array:
    """Pack raw codes (K, N) in [0, 2^bits) into (kp, N) int32, kp=ceil(K/f).

    STRIDED layout: word row r holds codes k with k % kp == r, code
    k = i*kp + r in bit slot i. This matches pltpu.repeat's tiling
    semantics (repeat([a,b],f) -> [a,b,a,b,...]), so the in-kernel unpack
    is tile + shift-by-(k//kp) + mask with no gathers."""
    assert 32 % bits == 0, bits
    f = 32 // bits
    k, n = q.shape
    kp = -(-k // f)
    pad = kp * f - k
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
    qr = q.reshape(f, kp, n).astype(jnp.uint32)     # [i, r] = code i*kp + r
    shifts = (jnp.arange(f, dtype=jnp.uint32) * bits)[:, None, None]
    words = (qr << shifts).sum(axis=0, dtype=jnp.uint32)
    return words.astype(jnp.int32)


def unpack_codes(words: jax.Array, bits: int, k: int) -> jax.Array:
    """Inverse of pack_codes (host-side oracle): (K, N) raw codes."""
    f = 32 // bits
    kp, n = words.shape
    w = words.astype(jnp.uint32)
    parts = [(w >> jnp.uint32(i * bits)) & jnp.uint32((1 << bits) - 1)
             for i in range(f)]                      # part i: codes i*kp + r
    full = jnp.concatenate(parts, axis=0)            # row i*kp + r
    return full[:k].astype(jnp.int32)


def _pqmm_kernel(x_ref, wp_ref, zp_w_ref, scale_ref, bias_ref, qp_ref,
                 out_ref, *, relu, bits, k):
    """x (TM, K) f32; wp (ceil(K/f), TN) int32 packed codes;
    zp_w/scale/bias (1, TN); qp (1,4) = [act_delta, act_zp, lo, hi]."""
    f = 32 // bits
    mask = (1 << bits) - 1
    delta = qp_ref[0, 0]
    zp = qp_ref[0, 1]
    lo = qp_ref[0, 2]
    hi = qp_ref[0, 3]
    # quantize activation tile to centered int8
    q = jnp.clip(jnp.round(x_ref[:] / delta) + zp, lo, hi) - zp
    xi = q.astype(jnp.int8)
    # unpack weights in VMEM, slot-sliced: with the strided packing,
    # unpacked row r of slot i (r in [0,kp)) is (word[r] >> i*bits) &
    # mask, and those rows are exactly the contiguous K-range
    # [i*kp, (i+1)*kp). Doing f slot dots of (TM,kp)x(kp,TN) instead of
    # one (TM,K)x(K,TN) dot on a materialized (K,TN) int32 intermediate
    # (the round-1 form: pltpu.repeat + per-row variable shift) removes
    # the 4-byte-per-code VMEM copy and the iota/variable-shift work —
    # the unpack was the kernel's bottleneck in the weight-dominated
    # regime (16k fc, M=1: 0.73 ms vs int8's 0.49 — the HBM win was
    # being eaten by unpack overhead).
    words = wp_ref[:]                                       # (kp, TN)
    kp = words.shape[0]
    # per-OC weight zero points are integral codes: subtract in the
    # int32 domain (one convert per code instead of the f32 round-trip)
    zp_w_i = jnp.round(zp_w_ref[:]).astype(jnp.int32)
    acc = jnp.zeros((xi.shape[0], words.shape[1]), jnp.int32)
    for i in range(f):
        lo_k = i * kp
        if lo_k >= k:
            break
        hi_k = min(lo_k + kp, k)        # last slot may be partial
        raw = (jax.lax.shift_right_logical(words, i * bits)) & mask
        wc = (raw - zp_w_i).astype(jnp.int8)
        acc = acc + jax.lax.dot_general(
            xi[:, lo_k:hi_k], wc[: hi_k - lo_k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (scale_ref[:] * delta) + bias_ref[:]
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("bits", "act_n_bits", "relu",
                                             "interpret", "tm", "tn"))
def packed_quant_matmul(x, w_packed, w_zp_n, scale_n, bias_n, act_delta,
                        act_zp, bits: int, act_n_bits: int = 4,
                        relu: bool = False, interpret: bool = False,
                        tm: int = 256, tn: int = 256):
    """y = relu?(dequant(int8mm(quant(x), unpack(w_packed) - zp_w))).

    x: (M, K) f32. w_packed: (ceil(K/f), N) int32 from pack_codes.
    w_zp_n: (N,) per-out-channel weight zero points.
    """
    m, k = x.shape
    kp, n = w_packed.shape
    f = 32 // bits
    assert kp * f >= k
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
        functools.partial(_pqmm_kernel, relu=relu, bits=bits, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
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
            bytes_accessed=m * k * 4 + kp * n * 4 + m * n * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, w_packed, w_zp_n.reshape(1, -1).astype(jnp.float32),
      scale_n.reshape(1, -1), bias_n.reshape(1, -1), qp)
