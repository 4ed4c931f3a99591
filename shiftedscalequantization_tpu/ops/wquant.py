"""Weight-quantizer family (functional pytrees).

Each quantizer is a registered dataclass pytree whose arrays are leaves and
whose mode switches are static metadata, dispatched by ``apply_weight_quant``.
They reimplement, TPU-first, the reference's four weight quantizers:

  * UniformWQ      — UniformAffineQuantizer on weights (quant_layer.py:77-98)
  * AdaRoundWQ     — AdaRoundQuantizer (adaptive_rounding.py:6-74)
  * ShiftedScaleWQ — ChannelQuant, the paper's novelty (channelQuant.py:6-307)
  * InpScaleWQ     — ChannelQuantMSE closed-form input-channel scale
                     (channelQuantMSE.py:6-143)

All candidate/selection math is vectorized: the per-(out-channel,
in-channel) candidate precompute is a stacked (S, *w.shape) tensor, the
soft/hard mixtures are einsums over the S axis, and the alpha
initialization's per-pair MSE argmin (channelQuant.py:158-191, a Python
loop in the reference) is one reduction.

Shift-selection granularity matches the reference exactly
(channelQuant.py:10, RUN_CHANNEL_WISE=True): for convs, alpha is per
*input channel* (shape (IC, S), broadcast over out-channels — the paper's
input-channel group R); for linear layers it is per (OC, IC) pair.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import quant as Q
from .quant import QParams


# ---------------------------------------------------------------------------
# Uniform
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UniformWQ:
    """Plain STE uniform affine fake-quant (per-out-channel delta)."""
    qp: QParams

    def __call__(self, w):
        delta = _bshape(self.qp.delta, w)
        zp = _bshape(self.qp.zero_point, w)
        lo, hi = self.qp.qrange()
        x_int = Q.round_ste(w / delta) + zp
        return (jnp.clip(x_int, lo, hi) - zp) * delta


def _bshape(a, w):
    """Broadcast per-out-channel (OC,1) params against an (OC,...) weight.
    Already-full-rank params (e.g. per-(oc,ic) effective deltas after
    update_delta) pass through unchanged."""
    a = jnp.asarray(a)
    if a.ndim == 0 or a.ndim == w.ndim:
        return a
    return a.reshape((a.shape[0],) + (1,) * (w.ndim - 1))


# ---------------------------------------------------------------------------
# AdaRound
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdaRoundWQ:
    """AdaRound learned rounding (reference adaptive_rounding.py:38-61).

    forward: floor(w/delta) + h(alpha) (soft) or [alpha>=0] (hard), clamp,
    dequant. ``soft`` is static so hardening recompiles once.
    """
    qp: QParams
    alpha: jax.Array          # weight-shaped rounding logits
    soft: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # BRECQ AdaRound always clamps unsigned (adaptive_rounding.py:58);
    # ChannelQuant's 'adaround' mode clamps sym-aware (channelQuant.py:72-75)
    signed_clamp: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)
    # two-phase baked shifts (update_delta, channelQuant.py:296-298), kept
    # factorized: effective delta = per-OC qp.delta * shift_targets[st_index]
    # with st_index per input channel (conv) or per (oc, ic) (linear) — the
    # factorization lets the deploy path run grouped int convs with a
    # per-(group, OC) scale-table epilogue instead of falling back to float
    st_index: Optional[jax.Array] = None
    shift_targets: Tuple[float, ...] = dataclasses.field(
        metadata=dict(static=True), default=())

    def _delta(self, w):
        delta = _bshape(self.qp.delta, w)
        if self.st_index is not None:
            st = jnp.asarray(self.shift_targets, w.dtype)[self.st_index]
            if self.st_index.ndim == 1 and w.ndim == 4:
                st = st.reshape(1, -1, 1, 1)
            delta = delta * st
        return delta

    def __call__(self, w):
        delta = self._delta(w)
        zp = _bshape(self.qp.zero_point, w)
        x_floor = jnp.floor(w / delta)
        if self.soft:
            x_int = x_floor + Q.rectified_sigmoid(self.alpha)
        else:
            x_int = x_floor + (self.alpha >= 0).astype(w.dtype)
        if self.signed_clamp and self.qp.sym:
            lo, hi = -(self.qp.n_levels // 2), self.qp.n_levels // 2 - 1
        else:
            lo, hi = 0, self.qp.n_levels - 1
        x_q = jnp.clip(x_int + zp, lo, hi)
        return (x_q - zp) * delta


@jax.jit
def init_adaround(qp: QParams, w: jax.Array) -> AdaRoundWQ:
    """alpha init s.t. sigmoid(alpha) = frac(w/delta) (adaptive_rounding.py:66-74)."""
    delta = _bshape(qp.delta, w)
    rest = w / delta - jnp.floor(w / delta)
    return AdaRoundWQ(qp=qp, alpha=Q.inverse_rectified_sigmoid(rest), soft=True)


# ---------------------------------------------------------------------------
# Shifted scale (the paper's method)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShiftedScaleWQ:
    """ChannelQuant in fused 'adaShift' mode (reference channelQuant.py:49-64).

    Holds |S| precomputed floor-code candidates ``x_q[s] =
    floor(w / (delta * shift_targets[s]))`` (channelQuant.py:279-294), a
    selection logit ``alpha`` ((IC,S) for convs / (OC,IC,S) for linear) and
    AdaRound logits ``beta`` (weight-shaped). Forward soft-mixes (or
    hard-selects) the candidate codes, adds the soft/hard rounding offset,
    clamps and dequantizes at ``delta * 1.0`` — matching the reference's
    fused path where the shift acts on the *codes*, so the deployed form is
    a standard int tensor with per-out-channel scale.
    """
    qp: QParams
    alpha: jax.Array
    beta: Optional[jax.Array]
    x_q: jax.Array                  # (S, *w.shape) floor codes / dequant values
    shift_targets: Tuple[float, ...] = dataclasses.field(
        metadata=dict(static=True))
    hard_targets: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)
    hard_round: bool = dataclasses.field(metadata=dict(static=True),
                                         default=False)
    # codes=True: fused 'adaShift' mode, x_q are floor codes (channelQuant.py
    # init_v_beta:279-294). codes=False: two-phase 'learned_hard_sigmoid'
    # mode, x_q are full fake-quant values and forward is the bare mixture
    # (channelQuant.py:81-82 with init_v:201-213).
    codes: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # dequant='unit': reference-faithful fused semantics — the mixed codes
    # dequantize at the BASE delta (channelQuant.py:287 resets shiftedScale
    # to 1.0 before forward :63), so candidate st effectively MULTIPLIES the
    # weight by 1/st; only sane for st ~= 1 (the snapshot's 31/32, 33/32).
    # dequant='effective': the paper's intended step-size semantics — each
    # candidate's codes dequantize at delta*st (matching get_delta/update_
    # delta, channelQuant.py:221-237,296-298), so coarse candidate sets
    # ({1/4,1/2,1}) act as finer PER-INPUT-CHANNEL grids, not 4x weight
    # scalings. Required for any shiftTarget far from 1.
    dequant: str = dataclasses.field(metadata=dict(static=True),
                                     default="unit")

    # -- selection --------------------------------------------------------
    def soft_targets(self):
        return Q.rectified_softmax(self.alpha, axis=-1)

    def mix_codes(self, dtype=jnp.float32):
        """Soft/hard mixture of candidate codes (channelQuant.py:96-118)."""
        p = self.soft_targets()
        if self.hard_targets:
            idx = jnp.argmax(p, axis=-1)
            p = jax.nn.one_hot(idx, len(self.shift_targets), dtype=dtype)
        return _mix(self.x_q, p)

    def __call__(self, w):
        if not self.codes:
            return self.mix_codes(w.dtype)
        delta = _bshape(self.qp.delta, w)
        zp = _bshape(self.qp.zero_point, w)
        lo, hi = self.qp.qrange()
        if self.hard_round:
            off = (self.beta >= 0).astype(w.dtype)
        else:
            off = Q.rectified_sigmoid(self.beta)
        if self.dequant == "effective":
            # mix the per-candidate DEQUANTIZED values (codes + shared
            # rounding offset, each at its own delta*st grid); the hard
            # form equals AdaRoundWQ with st_index = argmax (see
            # shifted_to_baked), which keeps the int deploy path via the
            # per-(group, OC) scale-table epilogue
            sts = jnp.asarray(self.shift_targets, w.dtype).reshape(
                (-1,) + (1,) * w.ndim)
            vals = (jnp.clip(self.x_q + off[None] + zp[None], lo, hi)
                    - zp[None]) * (delta[None] * sts)
            p = self.soft_targets()
            if self.hard_targets:
                idx = jnp.argmax(p, axis=-1)
                p = jax.nn.one_hot(idx, len(self.shift_targets),
                                   dtype=w.dtype)
            return _mix(vals, p)
        x_floor = self.mix_codes(w.dtype)
        x_int = x_floor + off
        x_q = jnp.clip(x_int + zp, lo, hi)
        return (x_q - zp) * delta

    def effective_delta(self, w):
        """Per-(oc,ic) delta * shift_targets[argmax p] (channelQuant.py:221-237)."""
        delta = _bshape(self.qp.delta, w)
        p = self.soft_targets()
        idx = jnp.argmax(p, axis=-1)
        st = jnp.asarray(self.shift_targets, dtype=w.dtype)[idx]
        if self.alpha.ndim == 2 and w.ndim == 4:   # conv: (IC,) -> (1,IC,1,1)
            st = st.reshape(1, -1, 1, 1)
        return delta * st


def _mix(x_q, p):
    """einsum-mix stacked candidates with selection probabilities.

    x_q: (S, OC, IC, KH, KW) or (S, OC, IC); p: (IC, S) or (OC, IC, S).
    """
    if x_q.ndim == 5:
        if p.ndim == 2:                       # conv, per-input-channel
            return jnp.einsum("soihw,is->oihw", x_q, p)
        return jnp.einsum("soihw,ois->oihw", x_q, p)
    if p.ndim == 2 and p.shape[0] == x_q.shape[2]:
        return jnp.einsum("soi,is->oi", x_q, p)
    return jnp.einsum("soi,ois->oi", x_q, p)


def _selection_mse(w, x_q, per_pair: bool):
    """Per-selection-group candidate MSE (channelQuant.py:158-171).

    conv + channel-wise: sum (w - x_q[s])^2 over (OC, KH, KW) -> (S, IC).
    linear: elementwise -> (S, OC, IC).
    """
    d2 = (w[None] - x_q) ** 2
    if w.ndim == 4 and not per_pair:
        return d2.sum(axis=(1, 3, 4))          # (S, IC)
    return d2                                   # (S, OC, IC) for linear


def init_alpha_from_mse(w, x_q, n_targets: int, clip: float = 0.33):
    """alpha init from per-group MSE argmin (channelQuant.py:158-191).

    The argmin candidate gets probability ``clip`` (the reference hard-codes
    0.33 at channelQuant.py:160), the rest share (1-clip); logits via
    inverse rectified softmax. NOTE (faithful to the reference fused path):
    the MSE is computed against the stored candidates — floor *codes* in the
    fused path — and serves only as a rough init; alpha is then optimized.
    """
    per_pair = w.ndim != 4
    mse = _selection_mse(w, x_q, per_pair)     # (S, IC) or (S, OC, IC)
    min_index = jnp.argmin(mse, axis=0)        # (IC,) or (OC, IC)
    if n_targets == 1:
        p = jnp.ones(min_index.shape + (1,), w.dtype)
    else:
        remain = (1.0 - clip) / (n_targets - 1)
        onehot = jax.nn.one_hot(min_index, n_targets, dtype=w.dtype)
        p = onehot * clip + (1.0 - onehot) * remain
    return Q.inverse_rectified_softmax(p, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("shift_targets", "clip", "dequant"))
def init_shifted_scale(qp: QParams, w: jax.Array,
                       shift_targets: Tuple[float, ...],
                       clip: Optional[float] = None,
                       dequant: str = "unit") -> ShiftedScaleWQ:
    """Fused shift+round init (reference channelQuant.py:279-294 init_v_beta).

    Precomputes floor codes per candidate, inits alpha from the MSE argmin
    rule, then inits beta s.t. sigmoid(beta) = frac(w / effective_delta).
    For dequant='effective' the alpha-init MSE compares the DEQUANTIZED
    candidate values against w (the floor codes live on different grids,
    so raw-code distances would be meaningless there).
    """
    delta = _bshape(qp.delta, w)
    zp = _bshape(qp.zero_point, w)
    lo, hi = qp.qrange()
    sts = jnp.asarray(shift_targets, dtype=w.dtype)
    x_q = jnp.stack([jnp.floor(w / (delta * st)) for st in sts])
    if dequant == "effective":
        mse_cands = jnp.stack([
            (jnp.clip(jnp.round(w / (delta * st)) + zp, lo, hi) - zp)
            * (delta * st) for st in sts])
        # intended-behavior clip (the reference's dead init_v_beta call-site
        # rule, channelQuant.py:288): the argmin must actually be the
        # argmax of p — the snapshot's hard-coded 0.33 ("#TODO Temp code",
        # channelQuant.py:160) INVERTS the ordering for |S| = 3
        default_clip = max(0.90 - 0.05 * len(shift_targets), 0.5)
    else:
        mse_cands = x_q
        default_clip = 0.33
    alpha = init_alpha_from_mse(w, mse_cands, len(shift_targets),
                                clip=default_clip if clip is None else clip)
    wq = ShiftedScaleWQ(qp=qp, alpha=alpha, beta=jnp.zeros_like(w), x_q=x_q,
                        shift_targets=tuple(shift_targets), dequant=dequant)
    delta_eff = wq.effective_delta(w)
    rest = w / delta_eff - jnp.floor(w / delta_eff)
    beta = Q.inverse_rectified_sigmoid(rest)
    return dataclasses.replace(wq, beta=beta)


@functools.partial(jax.jit, static_argnames=("shift_targets", "clip"))
def init_shifted_scale_twophase(qp: QParams, w: jax.Array,
                                shift_targets: Tuple[float, ...],
                                clip: Optional[float] = None) -> ShiftedScaleWQ:
    """Two-phase shift-phase init (reference channelQuant.py:201-213 init_v):
    candidates are *full fake-quant values* at each shifted step size; the
    forward is the bare soft/hard mixture ('learned_hard_sigmoid')."""
    delta = _bshape(qp.delta, w)
    zp = _bshape(qp.zero_point, w)
    lo, hi = qp.qrange()
    cands = []
    for st in shift_targets:
        x_int = jnp.round(w / (delta * st))
        x_qc = jnp.clip(x_int + zp, lo, hi)
        cands.append((x_qc - zp) * (delta * st))
    x_q = jnp.stack(cands)
    alpha = init_alpha_from_mse(w, x_q, len(shift_targets),
                                clip=0.33 if clip is None else clip)
    return ShiftedScaleWQ(qp=qp, alpha=alpha, beta=None, x_q=x_q,
                          shift_targets=tuple(shift_targets), codes=False)


def warmstart_alpha(wq: ShiftedScaleWQ, alpha: jax.Array,
                    w: jax.Array) -> ShiftedScaleWQ:
    """Re-seed a fused quantizer's selection from a solved alpha (the
    two-phase shift pre-solve) and re-derive the rounding logits on the
    re-seeded argmax grid, exactly as init_shifted_scale does on its MSE
    init: beta s.t. sigmoid(beta) = frac(w / effective_delta). Used by
    the fused warm-start (engine.ReconSettings.warmstart_frac) — the
    joint phase then starts from a selection that was optimized against
    the network loss instead of the per-tensor MSE argmin, with rounding
    logits consistent with that selection."""
    wq = dataclasses.replace(wq, alpha=alpha)
    delta_eff = wq.effective_delta(w)
    rest = w / delta_eff - jnp.floor(w / delta_eff)
    return dataclasses.replace(wq, beta=Q.inverse_rectified_sigmoid(rest))


def bake_shift_to_adaround(wq: ShiftedScaleWQ, w: jax.Array) -> AdaRoundWQ:
    """Two-phase transition: bake chosen shifts into the effective delta
    (reference update_delta, channelQuant.py:296-298) then init AdaRound
    beta on it (init_beta, channelQuant.py:300-307; sym-aware clamp).
    The shift selection is kept factorized (st_index + shift_targets)
    rather than materialized into a full-rank delta, so deploy can emit
    grouped int convs."""
    st_index = jnp.argmax(wq.soft_targets(), axis=-1)
    out = AdaRoundWQ(qp=wq.qp, alpha=jnp.zeros_like(w), soft=True,
                     signed_clamp=True, st_index=st_index,
                     shift_targets=tuple(wq.shift_targets))
    delta_eff = out._delta(w)
    x_floor = jnp.floor(w / delta_eff)
    rest = w / delta_eff - x_floor
    beta = Q.inverse_rectified_sigmoid(rest)
    return dataclasses.replace(out, alpha=beta)


def shifted_to_baked(wq: ShiftedScaleWQ) -> AdaRoundWQ:
    """Harden a fused effective-dequant ShiftedScaleWQ into the factorized
    baked form: AdaRoundWQ with st_index = argmax(selection) and the round
    logits carried over. Value-identical to the hard effective forward
    (floor(w/(delta*st_sel)) + [beta>=0], sym-aware clamp, dequant at
    delta*st_sel), and the form the deploy converter already lowers to
    grouped int convs with a per-(candidate, OC) scale table."""
    st_index = jnp.argmax(wq.soft_targets(), axis=-1)
    return AdaRoundWQ(qp=wq.qp, alpha=wq.beta, soft=False,
                      signed_clamp=True, st_index=st_index,
                      shift_targets=tuple(wq.shift_targets))


def rank_shift_candidates(qp: QParams, w: jax.Array, num_of_candi: int = 3):
    """Data-driven candidate search over {1/8..15/8}\\{1} by rank voting
    (reference channelQuant.py:239-277). Returns a python tuple of targets
    (host-side; small amounts of data)."""
    delta = _bshape(qp.delta, w)
    zp = _bshape(qp.zero_point, w)
    lo, hi = qp.qrange()
    candidates = [i / 8 for i in range(1, 16) if i != 8]
    mses = []
    for st in candidates:
        x_int = jnp.round(w / (delta * st))
        x_q = jnp.clip(x_int + zp, lo, hi)
        x_f = (x_q - zp) * (delta * st)
        e = jnp.abs(x_f - w) ** 2.4
        if w.ndim == 4:
            mses.append(e.sum(axis=(0, 2, 3)))      # per input channel
        else:
            mses.append(e.sum(axis=0))
    m = jnp.stack(mses)                              # (C, IC)
    order = jnp.argsort(m, axis=0)[:num_of_candi]    # best-first ranks
    weights = jnp.arange(num_of_candi, 0, -1)[:, None]
    scores = jnp.zeros(len(candidates)).at[order.reshape(-1)].add(
        jnp.broadcast_to(weights, order.shape).reshape(-1).astype(jnp.float32))
    top = jnp.argsort(-scores)[: num_of_candi - 1]
    result = [candidates[int(i)] for i in jax.device_get(top)]
    result.append(1.0)
    return tuple(result)


# ---------------------------------------------------------------------------
# Closed-form input-channel scale (ChannelQuantMSE)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class InpScaleWQ:
    """Per-input-channel scale quantizer (reference channelQuantMSE.py:126-143).

    zero point is re-derived from the raw (unrounded) zero offset:
    zp = round(raw_zp / delta); forward:
    round(w / inp_scale / delta) + zp, clamp unsigned, dequant at
    delta * inp_scale.
    """
    qp: QParams
    raw_zero_point: jax.Array
    inp_scale: jax.Array          # (1, IC, KH, KW) conv / (1, IC) linear

    def __call__(self, w):
        delta = _bshape(self.qp.delta, w)
        zp = jnp.round(_bshape(self.raw_zero_point, w) / delta)
        x_int = Q.round_ste(w / self.inp_scale / delta) + zp
        x_q = jnp.clip(x_int, 0, self.qp.n_levels - 1)
        return (x_q - zp) * delta * self.inp_scale


def init_inp_scale(qp: QParams, raw_zp: jax.Array, w: jax.Array,
                   level: int = 1, threshold: float = 1.0) -> InpScaleWQ:
    """Range-fit rule (reference channelQuantMSE.py:70-108, mode='max').

    For candidates c = level/level, (level-1)/level, ..., 1/level (tried in
    that order), pick per element the *last* candidate whose normalized
    codes stay within [0 - 0.5/(L-1)*thr, 1 + 0.5/(L-1)*thr] when reduced
    over the out-channel axis — i.e. shrink the effective step where the
    channel's dynamic range allows it without new clipping.
    """
    delta = _bshape(qp.delta, w)
    zp = jnp.round(_bshape(raw_zp, w) / delta)
    x_range = qp.n_levels - 1
    min_lim = 0.0 - 0.5 / x_range * threshold
    max_lim = 1.0 + 0.5 / x_range * threshold
    inp_shape = (1,) + w.shape[1:]
    inp_scale = jnp.ones(inp_shape, dtype=w.dtype)
    for i in range(level, 0, -1):
        c = i / level
        x_int = w / c / delta + zp
        x_norm = x_int / x_range
        ok = ((x_norm.min(axis=0, keepdims=True) > min_lim)
              & (x_norm.max(axis=0, keepdims=True) < max_lim))
        inp_scale = jnp.where(ok, c, inp_scale)
    return InpScaleWQ(qp=qp, raw_zero_point=raw_zp, inp_scale=inp_scale)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def apply_weight_quant(wq, w):
    if wq is None:
        return w
    return wq(w)
