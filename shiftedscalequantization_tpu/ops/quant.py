"""Core uniform-affine quantization math (TPU-native, functional).

Reimplements — as pure, jittable, vmappable JAX functions — the quantizer
math of the reference's ``quant/quant_layer.py`` (UniformAffineQuantizer,
round_ste, lp_loss; reference lines quant_layer.py:18-185) and the shared
soft-target relaxation constants used by AdaRound / shifted-scale selection
(gamma=-0.1, zeta=1.1; reference adaptive_rounding.py:32, channelQuant.py:35).

Design notes (TPU-first):
  * No lazy init / mutable module state: scale initialization is an explicit
    pure function returning a ``QParams`` pytree.
  * The per-channel MSE grid search (reference quant_layer.py:144-162, a
    Python loop over channels and 80 grid points) is a single vectorized
    computation over a (channels, 80) candidate grid — one XLA program.
  * Everything is shape-static and dtype-explicit so XLA can fuse the
    fake-quant elementwise chain into adjacent matmuls.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# Soft-target relaxation constants (AdaRound): clamp(sigmoid(a)*(zeta-gamma)+gamma, 0, 1)
GAMMA = -0.1
ZETA = 1.1


def round_ste(x: jax.Array) -> jax.Array:
    """Round with straight-through gradient (reference quant_layer.py:18-22)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def floor_ste(x: jax.Array) -> jax.Array:
    """Floor with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


def lp_loss(pred: jax.Array, tgt: jax.Array, p: float = 2.0,
            reduction: str = "none", channel_axis: int = -1) -> jax.Array:
    """L_p reconstruction loss (reference quant_layer.py:25-32).

    reduction='none': sum over the channel axis, then mean (the reference's
    default, written for NCHW/NC tensors where channels sit at axis 1).
    reduction='all': plain mean.

    This repo's activations are NHWC, so ``channel_axis`` defaults to -1
    (the engine's lp_loss_cl alias). Callers holding NCHW-layout tensors
    (e.g. the parity harness, or (OC, IC, KH, KW) weights) must pass
    ``channel_axis=1`` explicitly — the old hardcoded axis-1 sum silently
    summed over H for NHWC inputs.
    """
    d = jnp.abs(pred - tgt) ** p
    if reduction == "none":
        return d.sum(axis=channel_axis).mean()
    return d.mean()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QParams:
    """Affine quantizer parameters: x_q = clamp(round(x/delta)+zp, lo, hi).

    ``delta``/``zero_point`` broadcast against the tensor being quantized
    (scalar for per-tensor, shaped (..,1,..) or (O,) broadcastable for
    per-channel). ``n_bits``/``sym`` are static.
    """
    delta: jax.Array
    zero_point: jax.Array
    n_bits: int = dataclasses.field(metadata=dict(static=True))
    sym: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def n_levels(self) -> int:
        return 2 ** self.n_bits

    def qrange(self) -> tuple[int, int]:
        n = self.n_levels
        return (-(n // 2), n // 2 - 1) if self.sym else (0, n - 1)


def fake_quant(x: jax.Array, qp: QParams) -> jax.Array:
    """STE fake quantization (reference quant_layer.py:77-98).

    x_int = round_ste(x/delta) + zp; clamp to the signed/unsigned range;
    dequantize. Gradient flows straight through the rounding.
    """
    lo, hi = qp.qrange()
    x_int = round_ste(x / qp.delta) + qp.zero_point
    x_q = jnp.clip(x_int, lo, hi)
    return (x_q - qp.zero_point) * qp.delta


def quantize_int(x: jax.Array, qp: QParams, dtype=jnp.int8) -> jax.Array:
    """True integer quantization (deploy path): returns int codes."""
    lo, hi = qp.qrange()
    x_int = jnp.round(x / qp.delta) + qp.zero_point
    return jnp.clip(x_int, lo, hi).astype(dtype)


def dequantize(codes: jax.Array, qp: QParams) -> jax.Array:
    return (codes.astype(qp.delta.dtype) - qp.zero_point) * qp.delta


# ---------------------------------------------------------------------------
# Scale initialization
# ---------------------------------------------------------------------------

def _quant_with_range(x, new_max, new_min, n_bits):
    """Quantize x with range [new_min, new_max] (reference quant_layer.py:168-175).

    new_max/new_min broadcast against x (use extra leading axes for the grid).
    """
    n_levels = 2 ** n_bits
    delta = (new_max - new_min) / (n_levels - 1)
    delta = jnp.where(jnp.abs(delta) < 1e-12, 1e-12, delta)
    zero_point = jnp.round(-new_min / delta)
    x_int = jnp.round(x / delta)
    x_q = jnp.clip(x_int + zero_point, 0, n_levels - 1)
    return (x_q - zero_point) * delta


def init_scale_minmax(x: jax.Array, n_bits: int, sym: bool,
                      reduce_axes: Optional[tuple] = None,
                      scale_bits_adjust: bool = False):
    """'max' scale init (reference quant_layer.py:124-142).

    Returns (delta, zero_point, raw_zero_point) reduced over ``reduce_axes``
    (None = whole tensor). zero_point is the rounded integer offset;
    raw_zero_point is -x_min (kept for the MSE input-scale quantizer).
    """
    n_levels = 2 ** n_bits
    x_min = jnp.minimum(x.min(axis=reduce_axes, keepdims=reduce_axes is not None), 0.0)
    x_max = jnp.maximum(x.max(axis=reduce_axes, keepdims=reduce_axes is not None), 0.0)
    if scale_bits_adjust:  # 'scale' variant: shrink range for low bitwidths
        x_min = x_min * (n_bits + 2) / 8
        x_max = x_max * (n_bits + 2) / 8
    if sym:
        x_absmax = jnp.maximum(jnp.abs(x_min), x_max)
        x_min = jnp.where(x_min < 0, -x_absmax, 0.0)
        x_max = x_absmax
    delta = (x_max - x_min) / (n_levels - 1)
    delta = jnp.maximum(delta, 1e-8)
    zero_point = jnp.round(-x_min / delta)
    return delta, zero_point, -x_min


def init_scale_mse(x: jax.Array, n_bits: int, sym: bool,
                   n_grid: int = 80, p: float = 2.4):
    """LAPQ-style MSE grid scale init for a single slice/tensor
    (reference quant_layer.py:144-162), fully vectorized over the grid.

    Shrinks [x_min, x_max] by i% for i in 0..n_grid-1, quantizes, and keeps
    the range minimizing the L_p error. Returns (delta, zp, raw_zp).
    """
    n_levels = 2 ** n_bits
    x_max = x.max()
    x_min = x.min()
    if sym:
        x_absmax = jnp.maximum(jnp.abs(x_min), x_max)
        x_min = jnp.where(x_min < 0, -x_absmax, 0.0)
        x_max = x_absmax
    shrink = 1.0 - jnp.arange(n_grid, dtype=x.dtype) * 0.01          # (G,)
    new_max = x_max * shrink                                          # (G,)
    new_min = x_min * shrink
    grid_shape = (n_grid,) + (1,) * x.ndim
    xq = _quant_with_range(x[None], new_max.reshape(grid_shape),
                           new_min.reshape(grid_shape), n_bits)       # (G, *x)
    score = (jnp.abs(xq - x[None]) ** p).reshape(n_grid, -1).mean(axis=1)
    best = jnp.argmin(score)
    bmax, bmin = new_max[best], new_min[best]
    delta = (bmax - bmin) / (n_levels - 1)
    delta = jnp.where(jnp.abs(delta) < 1e-12, 1e-12, delta)
    if sym:
        zero_point = jnp.zeros_like(delta)
        raw_zp = jnp.zeros_like(delta)
    else:
        zero_point = jnp.round(-bmin / delta)
        raw_zp = -bmin
    return delta, zero_point, raw_zp


@partial(jax.jit, static_argnames=("n_bits", "sym", "channel_wise",
                                   "scale_method"))
def init_weight_qparams(w_oc_flat: jax.Array, n_bits: int, sym: bool,
                        channel_wise: bool, scale_method: str = "mse"):
    """Initialize weight quantizer scales.

    ``w_oc_flat``: weights reshaped to (OC, -1). Per-channel init vmaps the
    per-slice rule over OC (replacing the reference's Python loop at
    quant_layer.py:113-114). Returns QParams with delta/zp shaped (OC, 1)
    (channel-wise) or scalar, plus raw_zero_point with the same shape.
    """
    if channel_wise:
        if scale_method == "mse":
            f = jax.vmap(lambda s: init_scale_mse(s, n_bits, sym))
        else:
            f = jax.vmap(lambda s: init_scale_minmax(
                s, n_bits, sym, scale_bits_adjust="scale" in scale_method))
        delta, zp, raw_zp = f(w_oc_flat)
        delta, zp, raw_zp = (a.reshape(-1, 1) for a in (delta, zp, raw_zp))
    else:
        if scale_method == "mse":
            delta, zp, raw_zp = init_scale_mse(w_oc_flat, n_bits, sym)
        else:
            delta, zp, raw_zp = init_scale_minmax(
                w_oc_flat, n_bits, sym, scale_bits_adjust="scale" in scale_method)
    return QParams(delta=delta, zero_point=zp, n_bits=n_bits, sym=sym), raw_zp


def init_act_qparams(x: jax.Array, n_bits: int, sym: bool = False,
                     scale_method: str = "mse"):
    """Per-tensor activation scale init (leaf_param path of the reference)."""
    if scale_method == "mse":
        delta, zp, _ = init_scale_mse(x, n_bits, sym)
    else:
        delta, zp, _ = init_scale_minmax(
            x, n_bits, sym, scale_bits_adjust="scale" in scale_method)
    return QParams(delta=jnp.asarray(delta), zero_point=jnp.asarray(zp),
                   n_bits=n_bits, sym=sym)


# ---------------------------------------------------------------------------
# Soft-target relaxations (shared by AdaRound and shifted-scale selection)
# ---------------------------------------------------------------------------

def rectified_sigmoid(alpha: jax.Array) -> jax.Array:
    """clamp(sigmoid(a)*(zeta-gamma)+gamma, 0, 1) — reference adaptive_rounding.py:63-64."""
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def rectified_softmax(alpha: jax.Array, axis: int = -1) -> jax.Array:
    """clamp(softmax(a)*(zeta-gamma)+gamma, 0, 1) — reference channelQuant.py:120-121."""
    return jnp.clip(jax.nn.softmax(alpha, axis=axis) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def inverse_rectified_sigmoid(rest: jax.Array) -> jax.Array:
    """alpha s.t. rectified_sigmoid(alpha) == rest (reference adaptive_rounding.py:70-71)."""
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def inverse_rectified_softmax(p: jax.Array, axis: int = -1) -> jax.Array:
    """logits s.t. rectified_softmax(logits) == p (reference channelQuant.py:193-199)."""
    x = (p - GAMMA) / (ZETA - GAMMA)
    logits = jnp.log(x)
    return logits - logits.mean(axis=axis, keepdims=True)


def round_regularizer(soft_vals: jax.Array, b: jax.Array) -> jax.Array:
    """AdaRound rounding regularizer sum(1 - |2h-1|^b) (reference layer_recon.py:159-160)."""
    return (1.0 - (jnp.abs(soft_vals - 0.5) * 2.0) ** b).sum()


def linear_temp_decay(t, t_max: float, rel_start_decay: float = 0.2,
                      start_b: float = 20.0, end_b: float = 2.0):
    """Linear temperature decay b(t) (reference block_recon.py:185-202).

    Jittable: t may be a traced scalar.
    """
    start_decay = rel_start_decay * t_max
    rel_t = jnp.where(t_max != start_decay,
                      (t - start_decay) / (t_max - start_decay), 1.0)
    decayed = end_b + (start_b - end_b) * jnp.maximum(0.0, 1.0 - rel_t)
    return jnp.where(t < start_decay, start_b, decayed)
