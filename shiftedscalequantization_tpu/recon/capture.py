"""Calibration activation capture.

Replaces the reference's two capture mechanisms — hook-based
save_inp_oup_data (quant/data_utils.py:8-37) and in-module feature caching
(quant_layer.py:245-279 + the per-layer 'if'/'of' passes in
ShiftedScaleQuant.py:243-255) — with two jitted interpreter passes:

  * inputs captured under ``inp_flags`` (typically: already-reconstructed
    prefix weight-quantized — BRECQ's asymmetric reconstruction, the running
    use_weight_quant state in the reference driver)
  * target outputs captured under ``out_flags`` (typically all-FP:
    set_quant_state(False, False))

Both passes stop at the captured node (the reference's
StopForwardException early exit). Batched over the calibration set; results
stay on device (optionally bf16 to halve cache HBM).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import Flags, Graph, forward


def capture_io(graph: Graph, params, qstate, target: str, cali_data,
               inp_flags: Flags, out_flags: Flags, batch_size: int = 64,
               cache_dtype=None):
    """Return (cached_inp, cached_out) for ``target`` over ``cali_data``.

    cali_data: (N, H, W, C) on host or device. Runs ceil(N/batch) jitted
    capture passes per flag set and concatenates.
    """
    n = cali_data.shape[0]
    n_batches = max(n // batch_size, 1)

    @partial(jax.jit, static_argnames=("flags",))
    def cap(p, qs, xb, flags):
        return forward(graph, p, qs, xb, flags, capture=target)

    def run(flags, want_input):
        outs = []
        for i in range(n_batches):
            xb = cali_data[i * batch_size:(i + 1) * batch_size]
            cin, cout = cap(params, qstate, xb, flags)
            t = cin if want_input else cout
            if cache_dtype is not None:
                t = t.astype(cache_dtype)
            outs.append(t)
        return jnp.concatenate(outs, axis=0)

    cached_inp = run(inp_flags, want_input=True)
    cached_out = run(out_flags, want_input=False)
    return cached_inp, cached_out
