"""Checkpoint / resume for quantization state.

The reference checkpoints ad-hoc torch state dicts and pickles
(main_cifar10.py:86,101-102; myScaledMethods.py:200-261;
ShiftedScaleQuant.py:31-45). Here the whole quantization state is one
pytree whose leaves are arrays and whose structure (which quantizer class,
hardened or not, shift targets) is part of the dataclass pytree — so
checkpoints are self-describing: serialize the pytree with numpy leaves
(structure included), no pre-built template needed on restore. Resume
granularity is per reconstructed layer (a done-list in the same file),
matching the reference's sequential per-layer pipeline (SURVEY.md §5).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def _to_device(tree):
    return jax.tree.map(lambda a: jnp.asarray(a), tree)


def save_qstate(path: str, qstate, done: Optional[list] = None):
    """Save qstate pytree (+ per-layer done-list) to ``path``.pkl."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"qstate": _to_host(qstate), "done": list(done or [])}
    with open(path + ".pkl", "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_qstate(path: str, template=None):
    """Restore (qstate, done_list). Structure comes from the file itself;
    ``template`` is accepted for API compatibility and ignored."""
    path = os.path.abspath(path)
    with open(path + ".pkl", "rb") as f:
        payload = pickle.load(f)
    return _to_device(payload["qstate"]), payload.get("done", [])


def exists(path: str) -> bool:
    return os.path.exists(os.path.abspath(path) + ".pkl")
