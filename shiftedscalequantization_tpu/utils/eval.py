"""Evaluation harness: jitted top-1/top-5, golden-logit regression.

Functional equivalent of the reference's validate_model /
validate_with_loss (common.py:152-293): batched jitted accuracy, plus the
golden-logit MSE regression against a stored reference logits file
(common.py:206-214 compares concatenated logits to
./output_loss/result_{bit}bit.pt) — here an .npz of logits.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Flags, Graph, forward


@partial(jax.jit, static_argnames=("graph", "flags", "topk"))
def _batch_correct(graph, params, qstate, xb, yb, flags: Flags, topk=(1, 5)):
    logits = forward(graph, params, qstate, xb, flags)
    out = {}
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)
    hit = pred == yb[:, None]
    for k in topk:
        out[k] = hit[:, :k].any(axis=1).sum()
    return out, logits


def validate_model(graph: Graph, params, qstate, data: Iterable,
                   flags: Flags = Flags(), topk=(1, 5),
                   return_logits: bool = False, max_batches: Optional[int] = None):
    """data yields (images NHWC, labels). Returns dict of top-k accuracy %
    (and concatenated logits if requested, for golden-file regression)."""
    totals = {k: 0 for k in topk}
    n = 0
    logits_all = []
    for i, (xb, yb) in enumerate(data):
        if max_batches is not None and i >= max_batches:
            break
        correct, logits = _batch_correct(graph, params, qstate,
                                         jnp.asarray(xb), jnp.asarray(yb),
                                         flags, topk)
        for k in topk:
            totals[k] += int(correct[k])
        n += xb.shape[0]
        if return_logits:
            logits_all.append(np.asarray(logits))
    acc = {f"top{k}": 100.0 * totals[k] / max(n, 1) for k in topk}
    if return_logits:
        return acc, np.concatenate(logits_all, axis=0)
    return acc


def golden_logit_mse(logits: np.ndarray, path: str,
                     save_if_missing: bool = False) -> Optional[float]:
    """Golden-file logits regression (reference validate_with_loss,
    common.py:277-286). Returns MSE vs the stored file, or None after
    creating it."""
    if not os.path.exists(path):
        if save_if_missing:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            np.savez(path, logits=logits)
            return None
        raise FileNotFoundError(path)
    ref = np.load(path)["logits"]
    return float(np.mean((logits - ref) ** 2))


def get_train_samples(data: Iterable, num_samples: int = 1024):
    """First-N training images as the calibration set
    (reference common.py:144-150)."""
    batches = []
    total = 0
    for xb, _ in data:
        batches.append(np.asarray(xb))
        total += xb.shape[0]
        if total >= num_samples:
            break
    return jnp.asarray(np.concatenate(batches, axis=0)[:num_samples])
