"""Checkpoint / resume for quantization state.

The reference checkpoints ad-hoc torch state dicts and pickles
(main_cifar10.py:86,101-102; myScaledMethods.py:200-261;
ShiftedScaleQuant.py:31-45). Here the whole quantization state is one
pytree, serialized with orbax; resume granularity is per reconstructed
layer (a done-list side file), matching the reference's sequential
per-layer pipeline (SURVEY.md §5 checkpoint row).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import jax


def _ckpt(path):
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer(), os.path.abspath(path)


def save_qstate(path: str, qstate, done: Optional[list] = None):
    """Save qstate pytree + done-list. Static pytree structure is
    reconstructed by the caller (build the same model/config first)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as ck:
        ck.save(path + ".orbax", qstate, force=True)
    if done is not None:
        with open(path + ".done.json", "w") as f:
            json.dump({"done": done}, f)


def load_qstate(path: str, template):
    """Restore qstate into the structure of ``template`` (same model+config).
    Returns (qstate, done_list)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ck:
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
            if hasattr(a, "shape") else a, template)
        qstate = ck.restore(path + ".orbax", abstract)
    done = []
    if os.path.exists(path + ".done.json"):
        with open(path + ".done.json") as f:
            done = json.load(f)["done"]
    return qstate, done


def exists(path: str) -> bool:
    return os.path.exists(os.path.abspath(path) + ".orbax")
