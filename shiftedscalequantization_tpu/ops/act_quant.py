"""Activation-side shifted-scale quantizer.

The reference's ChannelQuantAct (quant/channelQuantAct.py:6-134) is
incomplete/broken — init_v references undefined variables and its
'shiftFeature' opt_mode is not handled by forward (SURVEY.md §2 "known
breakages"). This implements the *intended* behavior per the wiring spec in
the fused act-recon branch (layer_recon_fused_shiftedScale.py:37-57):
per-channel selection among shifted activation scales [1, 1/2], learnable
soft selection with the same rectified-softmax relaxation as the weight
side.

Unlike weights, activations change per batch, so the candidate tensors are
computed at runtime: x_q_s = fake_quant(x; delta*st_s), soft-mixed per
channel. Hardened selection is a per-channel static scale — for deploy it
folds into the producer's requant step.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from . import quant as Q
from .quant import QParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ActShiftQuant:
    """Per-channel shifted-scale activation fake-quant (channels-last)."""
    qp: QParams                     # base per-tensor delta / zero_point
    alpha: jax.Array                # (C, S) selection logits
    shift_targets: Tuple[float, ...] = dataclasses.field(
        metadata=dict(static=True))
    hard_targets: bool = dataclasses.field(metadata=dict(static=True),
                                           default=False)

    def soft_targets(self):
        return Q.rectified_softmax(self.alpha, axis=-1)

    def __call__(self, x):
        p = self.soft_targets()
        if self.hard_targets:
            p = jax.nn.one_hot(jnp.argmax(p, -1), len(self.shift_targets),
                               dtype=x.dtype)
        lo, hi = self.qp.qrange()
        cands = []
        for st in self.shift_targets:
            d = self.qp.delta * st
            q = jnp.clip(Q.round_ste(x / d) + self.qp.zero_point, lo, hi)
            cands.append((q - self.qp.zero_point) * d)
        xq = jnp.stack(cands)                      # (S, ..., C)
        return jnp.einsum("s...c,cs->...c", xq, p)

    def effective_delta(self):
        """Per-channel hardened step size (for deploy folding)."""
        idx = jnp.argmax(self.soft_targets(), -1)
        st = jnp.asarray(self.shift_targets)[idx]
        return self.qp.delta * st


def init_act_shift(qp: QParams, sample_nhwc: jax.Array,
                   shift_targets: Tuple[float, ...] = (1.0, 0.5),
                   clip: float = 0.8) -> ActShiftQuant:
    """alpha init from per-channel MSE argmin on a calibration sample
    (the weight-side init_alpha rule, channelQuant.py:158-191, applied to
    runtime-computed activation candidates)."""
    lo, hi = qp.qrange()
    mses = []
    for st in shift_targets:
        d = qp.delta * st
        q = jnp.clip(jnp.round(sample_nhwc / d) + qp.zero_point, lo, hi)
        xq = (q - qp.zero_point) * d
        e = ((xq - sample_nhwc) ** 2)
        mses.append(e.reshape(-1, e.shape[-1]).sum(axis=0))   # per channel
    mse = jnp.stack(mses)                                      # (S, C)
    min_index = jnp.argmin(mse, axis=0)                        # (C,)
    n = len(shift_targets)
    if n == 1:
        p = jnp.ones((min_index.shape[0], 1), sample_nhwc.dtype)
    else:
        remain = (1.0 - clip) / (n - 1)
        onehot = jax.nn.one_hot(min_index, n, dtype=sample_nhwc.dtype)
        p = onehot * clip + (1.0 - onehot) * remain
    return ActShiftQuant(qp=qp, alpha=Q.inverse_rectified_softmax(p),
                         shift_targets=tuple(shift_targets))
