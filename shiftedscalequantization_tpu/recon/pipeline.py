"""Sequential per-layer reconstruction pipeline.

The functional equivalent of the reference driver loop
(ShiftedScaleQuant.py channelShift_wLoss:185-286 and the BRECQ recon_model
recursion, Brecq/main_imagenet.py:204-227): walk the target nodes in order;
for each, capture inputs under the *already-reconstructed prefix* (BRECQ
asymmetric reconstruction — in the reference this emerges from
set_quant_state_block leaving use_weight_quant=True on finished layers) and
FP targets, run the reconstruction, then keep that node's weight quant on
for all later captures.

Resume granularity matches the reference's per-layer checkpointing
(SURVEY.md §5): state after each node is (qstate pytree + done-list), which
utils/checkpoint.py can serialize.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Sequence

import jax

from ..graph import Flags, Graph, node_unit_names, find_node
from .capture import capture_io
from .engine import ReconSettings, reconstruct_act_delta, reconstruct_node


def reconstruct_model(graph: Graph, params, qstate,
                      targets: Sequence[str], cali_data,
                      settings: ReconSettings, key: jax.Array,
                      batch_size: int = 64,
                      base_flags: Optional[Flags] = None,
                      cache_dtype=None,
                      on_node_done: Optional[Callable] = None,
                      act_phase: bool = False,
                      single_graph_capture: bool = False):
    """Reconstruct ``targets`` in order. Returns (qstate, history).

    ``base_flags``: starting prefix flags (e.g. 8-bit stem kept quantized).
    ``on_node_done(name, qstate, metrics, prefix_flags)``: hook for eval /
    checkpoint / logging after each node (the reference's per-layer
    validate_model accuracy trajectory, ShiftedScaleQuant.py:274-276).
    ``act_phase``: activation-side phase instead of weight recon — True or
    'delta' learns act deltas (the BRECQ act phase); 'shift' runs the
    activation shifted-scale selection (the reference's
    channelShift_wLoss_feature driver, ShiftedScaleQuant.py:288-353).
    Weight quantizers are assumed already hardened & on via base_flags.
    """
    prefix = base_flags if base_flags is not None else Flags()
    history = {}
    session = None
    if single_graph_capture and not act_phase:
        from .capture import CaptureSession
        session = CaptureSession(graph, params, cali_data, targets,
                                 batch_size=batch_size,
                                 output_affine=prefix.output_affine)
    for name in targets:
        t0 = time.time()
        key, sub = jax.random.split(key)
        if session is not None:
            cached_inp, cached_out = session.capture(
                qstate, name, prefix.weight_on, cache_dtype=cache_dtype)
        else:
            cached_inp, cached_out = capture_io(
                graph, params, qstate, name, cali_data,
                inp_flags=prefix, out_flags=Flags(), batch_size=batch_size,
                cache_dtype=cache_dtype)
        cached_grads = None
        if not act_phase and settings.rec_loss != "mse":
            from .capture import capture_grads
            # same batching as capture_io so cached row counts line up
            cached_grads = capture_grads(graph, params, qstate, name,
                                         cali_data, batch_size=batch_size)
        if act_phase == "shift":
            from .engine import reconstruct_act_shift
            qstate, metrics = reconstruct_act_shift(
                graph, params, qstate, name, cached_inp, cached_out,
                settings, sub)
        elif act_phase:
            qstate, metrics = reconstruct_act_delta(
                graph, params, qstate, name, cached_inp, cached_out,
                settings, sub)
        elif settings.mode == "two_phase":
            # per-layer shift phase then round phase on the same cache
            # (reference run_ShiftRecon: iters_for_round = 2*iters,
            # ShiftedScaleQuant.py:63-67 commented driver / the two-phase
            # stack of layer_recon_shiftedScale.py)
            s1 = dataclasses.replace(settings, mode="shift")
            qstate, m1 = reconstruct_node(
                graph, params, qstate, name, cached_inp, cached_out,
                s1, sub, cached_grads=cached_grads)
            s2 = dataclasses.replace(settings, mode="round",
                                     iters=settings.iters * 2)
            key, sub2 = jax.random.split(key)
            qstate, metrics = reconstruct_node(
                graph, params, qstate, name, cached_inp, cached_out,
                s2, sub2, cached_grads=cached_grads)
            metrics["shift_phase"] = m1
        else:
            qstate, metrics = reconstruct_node(
                graph, params, qstate, name, cached_inp, cached_out,
                settings, sub, cached_grads=cached_grads)
        del cached_inp, cached_out, cached_grads
        # keep this node quantized for subsequent captures (asym recon)
        prefix = dataclasses.replace(
            prefix, weight_on=prefix.weight_on
            | frozenset(node_unit_names(find_node(graph, name))))
        metrics["wall_s"] = time.time() - t0
        history[name] = metrics
        if on_node_done is not None:
            on_node_done(name, qstate, metrics, prefix)
    return qstate, history, prefix
