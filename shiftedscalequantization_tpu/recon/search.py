"""Greedy / random shift-selection search (non-gradient baselines).

Reimplements the reference's per-(out-channel, in-channel) search
harnesses — QuantModule.run_layerGreedy / run_layerDist / run_GreedyLoss /
run_GreedyLossSorted (quant_layer.py:325-528) and the randomize test
(myScaledMethods.py:418-501) — as vectorized/scan computations:

  * weight-space greedy: the weight L_p loss decomposes per (oc, ic) pair,
    so the reference's O(OC*IC*K) Python hill-climb is exactly a single
    batched argmin over the candidate axis.
  * output-space greedy: coordinate descent over input channels with
    incremental output updates — each step evaluates ALL out-channels and
    candidates at once (out-channels are independent given the input),
    replacing the reference's per-pair full-forward re-evaluation
    (quant_layer.py:443-446, a full cached-batch forward per pair).
  * random selection baseline with seeded keys.

Selections use the same granularity as ChannelQuant: per-(oc,ic) candidate
index; the result maps onto a hard ShiftedScaleWQ-style scale table.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import quant as Q
from ..ops.quant import QParams


def candidate_weights(qp: QParams, w: jax.Array,
                      shift_targets: Tuple[float, ...]) -> jax.Array:
    """(S, *w.shape) fully fake-quantized weights at each shifted step
    (the two-phase candidate form, channelQuant.py:201-213)."""
    from ..ops.wquant import _bshape
    delta = _bshape(qp.delta, w)
    zp = _bshape(qp.zero_point, w)
    lo, hi = qp.qrange()
    cands = []
    for st in shift_targets:
        x_int = jnp.round(w / (delta * st))
        x_q = jnp.clip(x_int + zp, lo, hi)
        cands.append((x_q - zp) * (delta * st))
    return jnp.stack(cands)


@partial(jax.jit, static_argnames=("p",))
def weight_greedy_selection(w, cands, p: float = 2.4):
    """argmin_k of the per-(oc,ic) weight loss — the exact optimum of the
    reference's weight-space greedy (run_layerGreedy, quant_layer.py:325-359,
    whose objective decomposes per pair). Returns (selection (OC,IC) int32,
    total loss)."""
    err = jnp.abs(cands - w[None]) ** p            # (S, OC, IC, ...)
    per_pair = err.reshape(err.shape[:3] + (-1,)).sum(-1)
    sel = jnp.argmin(per_pair, axis=0)             # (OC, IC)
    best = per_pair.min(axis=0).sum()
    return sel.astype(jnp.int32), best


def apply_selection(cands, sel):
    """Materialize the selected weight tensor from (S,...) candidates and a
    per-(oc,ic) selection."""
    onehot = jax.nn.one_hot(sel, cands.shape[0], dtype=cands.dtype)
    if cands.ndim == 5:
        return jnp.einsum("soihw,ois->oihw", cands, onehot)
    return jnp.einsum("soi,ois->oi", cands, onehot)


def _unit_out(spec, w, x):
    from ..graph import conv2d, linear
    if spec.kind == "conv":
        return conv2d(x, w, None, spec.stride, spec.padding, spec.groups)
    return linear(x, w, None)


def output_greedy_selection(spec, cands, cached_inp, cached_out,
                            sweeps: int = 1, p: float = 2.0):
    """Output-space coordinate-descent greedy (run_GreedyLoss,
    quant_layer.py:407-457): for each input channel, try every candidate for
    ALL out-channels at once, keep improvements, update the running output
    incrementally. ``cands``: (S, OC, IC, KH, KW) or (S, OC, IC).

    Returns (selection (OC, IC), final loss). Loss: sum over channel of
    |err|^p, mean over rest (the reference's lp_loss on the cached batch).
    """
    n_s, oc, ic = cands.shape[:3]
    x = cached_inp
    tgt = cached_out

    sel = jnp.zeros((oc, ic), jnp.int32)
    w_cur = apply_selection(cands, sel)
    out = _unit_out(spec, w_cur, x)

    def channel_contrib(k_sel_i, i):
        """Output contribution of input channel i under candidate k."""
        if cands.ndim == 5:
            w_i = cands[k_sel_i, :, i][:, None]      # (OC,1,KH,KW)
            xi = jax.lax.dynamic_slice_in_dim(x, i, 1, axis=3)
            import dataclasses as dc
            spec_i = dc.replace(spec, in_ch=1, groups=1)
            return _unit_out(spec_i, w_i, xi)
        w_i = cands[k_sel_i, :, i]                   # (OC,)
        xi = x[:, i]
        return xi[:, None] * w_i[None, :]

    def loss_of(o):
        return (jnp.abs(o - tgt) ** p).sum(-1).mean()

    for _ in range(sweeps):
        for i in range(ic):
            cur_k = sel[:, i]
            # current contribution of channel i (per out-channel selection)
            contribs = jnp.stack([channel_contrib(k, i)
                                  for k in range(n_s)])  # (S,N,...,OC)
            onehot_cur = jax.nn.one_hot(cur_k, n_s, dtype=contribs.dtype)
            cur_c = jnp.einsum("s...o,os->...o", contribs, onehot_cur)
            base = out - cur_c
            # per-out-channel loss for each candidate: out-channels are
            # independent, so evaluate all (S, OC) jointly
            errs = []
            for k in range(n_s):
                o_k = base + contribs[k]
                e = (jnp.abs(o_k - tgt) ** p)
                errs.append(e.reshape(-1, oc).mean(0))   # (OC,) mean-of-abs^p
            errs = jnp.stack(errs)                        # (S, OC)
            new_k = jnp.argmin(errs, axis=0).astype(jnp.int32)
            onehot_new = jax.nn.one_hot(new_k, n_s, dtype=contribs.dtype)
            new_c = jnp.einsum("s...o,os->...o", contribs, onehot_new)
            out = base + new_c
            sel = sel.at[:, i].set(new_k)
    return sel, loss_of(out)


def dist_selection(qp: QParams, w: jax.Array,
                   qparams: Tuple[float, ...] = (1.0, 0.5), p: float = 2.0):
    """Distance-metric greedy (run_layerDist, quant_layer.py:361-405).

    For each (oc, ic) pair the reference tries candidate divisors
    qParam[k] in {1.0, 0.5} with effective step ``delta / qParam[k]`` (note:
    *divided*, the opposite direction from ChannelQuant's delta * target)
    and keeps the k minimizing the plain L2 weight distance. Each pair is
    independent, so the whole O(OC*IC*K) loop is one batched argmin.

    Returns (selection (OC, IC) int32, total weight loss).
    """
    cands = candidate_weights(qp, w, tuple(1.0 / q for q in qparams))
    return weight_greedy_selection(w, cands, p=p)


def random_selection(key, oc: int, ic: int, n_targets: int,
                     prob_nonbase: float = 0.5):
    """Random per-(oc,ic) selection baseline (channelRandomizeTest,
    myScaledMethods.py:418-501): candidate 0 ('base') with probability
    1-prob_nonbase, otherwise uniform among the rest."""
    k1, k2 = jax.random.split(key)
    nonbase = jax.random.bernoulli(k1, prob_nonbase, (oc, ic))
    alt = jax.random.randint(k2, (oc, ic), 1, max(n_targets, 2))
    return jnp.where(nonbase, alt, 0).astype(jnp.int32)
