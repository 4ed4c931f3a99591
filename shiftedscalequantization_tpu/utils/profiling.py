"""Profiling / tracing subsystem.

The reference's observability is batch wall-clock meters and tqdm text
(common.py:160,195-197; SURVEY.md §5 "Tracing" row). Here:

  * ``trace(logdir)``: jax.profiler trace context (TensorBoard-compatible)
  * ``layer_timing``: per-node device time via on-device repeat loops
    (host timing is invalid on the remote TPU platform — see bench.py),
    with FLOP counts and achieved-FLOPs roofline fractions per node
  * ``node_flops``: analytic MAC*2 counts for conv/linear units
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import BlockSpec, Flags, Graph, OpSpec, UnitSpec, apply_node, \
    forward


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _conv_out_hw(h, w, spec: UnitSpec):
    oh = (h + 2 * spec.padding[0] - spec.kernel[0]) // spec.stride[0] + 1
    ow = (w + 2 * spec.padding[1] - spec.kernel[1]) // spec.stride[1] + 1
    return oh, ow


def unit_flops(spec: UnitSpec, in_hw, batch: int) -> int:
    """MAC*2 count for one unit at the given input spatial size."""
    if spec.kind == "linear":
        return 2 * batch * spec.in_ch * spec.out_ch
    oh, ow = _conv_out_hw(*in_hw, spec)
    k = spec.kernel[0] * spec.kernel[1]
    return 2 * batch * oh * ow * spec.out_ch * (spec.in_ch // spec.groups) * k


def graph_flops(graph: Graph, input_hw, batch: int):
    """Total MAC*2 count walking the graph with spatial-size tracking.
    Returns (total, {node_name: flops})."""
    hw = input_hw
    per = {}
    total = 0
    for node in graph:
        if isinstance(node, OpSpec):
            if node.op == "maxpool":
                hw = ((hw[0] + 2 * node.padding[0] - node.window[0])
                      // node.stride[0] + 1,
                      (hw[1] + 2 * node.padding[1] - node.window[1])
                      // node.stride[1] + 1)
            elif node.op in ("gap", "avgpool"):
                hw = (1, 1)
            continue
        fl = node_flops(node, hw, batch)
        per[node.name] = fl
        total += fl
        if isinstance(node, UnitSpec):
            if node.kind == "conv":
                hw = _conv_out_hw(*hw, node)
        else:
            for u in node.units:
                if u.kind == "conv":
                    hw = _conv_out_hw(*hw, u)
    return total, per


def node_flops(node, in_hw, batch: int):
    if isinstance(node, UnitSpec):
        return unit_flops(node, in_hw, batch)
    if isinstance(node, OpSpec):
        return 0
    total = 0
    hw = in_hw
    for u in node.units:
        total += unit_flops(u, hw, batch)
        hw = _conv_out_hw(*hw, u) if u.kind == "conv" else hw
    if node.downsample is not None:
        total += unit_flops(node.downsample, in_hw, batch)
    return total


def _device_time(fn, x, inner: int = 20) -> float:
    """Median-free single-shot on-device loop timing (see bench.py)."""
    def run_body(x):
        def body(acc, i):
            y = fn(x + i.astype(x.dtype) * 1e-6)
            return acc + y.sum(dtype=jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(inner, dtype=jnp.int32))
        return acc
    run = jax.jit(run_body)
    float(run(x))
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / inner


def layer_timing(graph: Graph, params, qstate, x, flags: Flags = Flags(),
                 peak_flops: Optional[float] = None, inner: int = 20):
    """Per-node timing table: run each unit/block on its captured input.

    Returns a list of dicts: name, ms, gflops, achieved TFLOP/s, and
    roofline fraction when ``peak_flops`` (e.g. 197e12 bf16 on v5e,
    394e12 int8) is given.
    """
    batch = x.shape[0]
    rows = []
    for node in graph:
        if isinstance(node, OpSpec):
            continue  # pool/reshape: negligible, folded into neighbors
        cin, cout = forward(graph, params, qstate, x, flags,
                            capture=node.name)
        t = _device_time(lambda v: apply_node(node, params, qstate, v, flags),
                         cin, inner)
        fl = node_flops(node, (cin.shape[1], cin.shape[2])
                        if cin.ndim == 4 else (1, 1), batch)
        row = {"name": node.name, "ms": t * 1e3, "gflop": fl / 1e9,
               "tflops": fl / t / 1e12 if t > 0 else 0.0}
        if peak_flops:
            row["roofline_frac"] = fl / t / peak_flops
        rows.append(row)
    return rows


def format_timing(rows) -> str:
    lines = [f"{'node':34s} {'ms':>8s} {'GFLOP':>8s} {'TFLOP/s':>8s}"]
    for r in rows:
        lines.append(f"{r['name']:34s} {r['ms']:8.3f} {r['gflop']:8.2f} "
                     f"{r['tflops']:8.1f}"
                     + (f"  ({r['roofline_frac'] * 100:.0f}% roof)"
                        if "roofline_frac" in r else ""))
    total_ms = sum(r["ms"] for r in rows)
    total_gf = sum(r["gflop"] for r in rows)
    lines.append(f"{'TOTAL':34s} {total_ms:8.3f} {total_gf:8.2f}")
    return "\n".join(lines)
