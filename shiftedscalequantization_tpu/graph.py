"""Explicit layer-graph IR + functional forward interpreter.

This replaces the reference's mutable PyTorch module tree (QuantModel /
QuantModule / BaseQuantBlock, reference quant/quant_model.py:7-106,
quant/quant_layer.py:188-280, quant/quant_block.py:13-248) with an explicit,
static graph of quantizable units and a pure interpreter:

  * A model is ``(graph, params)``: the graph is a tuple of static node specs
    (UnitSpec / BlockSpec / OpSpec), params a dict of arrays keyed by unit name.
  * Quantization state is an explicit pytree (``qstate``), never discovered by
    isinstance walks; per-unit quant on/off is a static ``Flags`` value, so
    "quantize only the prefix" (the reference's store/restore_quantization_state
    dance, quant_model.py:95-106) is just a different Flags value.
  * Activation capture (the reference's DataSaverHook + StopForwardException,
    quant/data_utils.py:74-99, and in-module cache_features, quant_layer.py:
    245-279) is the interpreter's ``capture=name`` argument: the forward
    returns that node's (input, output) and stops — no hooks, no exceptions,
    fully jittable.
  * Lazy activation-scale init (quant_layer.py:77-89) becomes a single traced
    pass (``mode='init_act'``) that computes each act quantizer's scale from
    the tensor flowing past it *and quantizes with it in the same trace* —
    bit-matching the reference's sequential lazy-init semantics in one XLA
    program.

Layouts: activations are NHWC (TPU-native); conv weights are stored in the
torch OIHW layout so all per-(out-channel, in-channel) quantizer math matches
the reference's tensor shapes exactly, and are transposed to HWIO at the conv
call (XLA folds the transpose into layout assignment).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Union

import jax
import jax.numpy as jnp

from .ops import quant as Q
from .ops.quant import QParams, fake_quant


# ---------------------------------------------------------------------------
# Static node specs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class UnitSpec:
    """A quantizable conv2d or linear layer (reference QuantModule)."""
    name: str
    kind: str                      # 'conv' | 'linear'
    in_ch: int
    out_ch: int
    kernel: tuple = (1, 1)
    stride: tuple = (1, 1)
    padding: tuple = (0, 0)        # symmetric (ph, pw)
    groups: int = 1
    activation: Optional[str] = None   # fused post-op: 'relu' | 'relu6' | None
    disable_act_quant: bool = False    # reference quant_block.py:84,92-93
    has_bn: bool = False               # torch model had a BN after this unit


@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """A residual block (reference BaseQuantBlock subclasses).

    Covers QuantBasicBlock / QuantBottleneck / QuantResBottleneckBlock /
    QuantInvertedResidual (reference quant_block.py:76-239): main-path units
    run sequentially; ``downsample`` (if any) maps the block input to the
    residual; ``residual`` adds the (possibly downsampled) input;
    ``post_activation`` runs after the add; the block-level act quantizer
    (keyed by the block's name) runs last.
    """
    name: str
    units: tuple                     # tuple[UnitSpec, ...] main path
    downsample: Optional[UnitSpec] = None
    residual: bool = True
    post_activation: Optional[str] = None
    # False for residual structures the reference does NOT register in
    # `specials` (MNASNet, quant_block.py:242-248): no block-level act
    # quantizer, and reconstruction happens per-unit.
    block_act_quant: bool = True


@dataclasses.dataclass(frozen=True)
class OpSpec:
    """A fixed non-quantized op between units (pool / flatten)."""
    name: str
    op: str                          # 'maxpool' | 'gap' | 'flatten' | 'avgpool'
    window: tuple = (1, 1)
    stride: tuple = (1, 1)
    padding: tuple = (0, 0)


Node = Union[UnitSpec, BlockSpec, OpSpec]
Graph = tuple


def iter_units(graph: Graph):
    """All quantizable units in execution order (downsample after main path,
    matching torch module registration order in the reference blocks)."""
    for node in graph:
        if isinstance(node, UnitSpec):
            yield node
        elif isinstance(node, BlockSpec):
            yield from node.units
            if node.downsample is not None:
                yield node.downsample


def iter_nodes(graph: Graph):
    yield from graph


def find_node(graph: Graph, name: str) -> Node:
    for node in graph:
        if node.name == name:
            return node
        if isinstance(node, BlockSpec):
            for u in node.units:
                if u.name == name:
                    return u
            if node.downsample is not None and node.downsample.name == name:
                return node.downsample
    raise KeyError(name)


# ---------------------------------------------------------------------------
# Quant state
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UnitQuant:
    """Per-unit quantization state.

    ``wq`` is one of the weight-quantizer pytrees from ops (UniformWQ,
    AdaRoundWQ, ShiftedScaleWQ, InpScaleWQ — see ops/wquant.py); ``aq`` the
    activation QParams (None until calibrated). ``alpha_out``/``beta_out``
    are the reference's per-out-channel affine gamma^z / phi^z
    (quant_layer.py:231-238), applied post-conv when weight quant is on.
    """
    wq: Any
    aq: Optional[QParams]
    alpha_out: Optional[jax.Array]
    beta_out: Optional[jax.Array]
    raw_zp: Optional[jax.Array] = None   # unrounded zero offset (-x_min),
                                         # kept for the MSE input-scale path


@dataclasses.dataclass(frozen=True)
class Flags:
    """Static per-unit quant enables. Hashable; part of the jit key."""
    weight_on: frozenset = frozenset()
    act_on: frozenset = frozenset()      # unit and block names
    output_affine: bool = False          # apply alpha_out/beta_out (bias_cal)

    def all_weights(self, graph: Graph) -> "Flags":
        return dataclasses.replace(
            self, weight_on=frozenset(u.name for u in iter_units(graph)))

    def all_acts(self, graph: Graph) -> "Flags":
        names = set()
        for node in graph:
            if isinstance(node, BlockSpec):
                names.add(node.name)
                names.update(u.name for u in node.units)
                if node.downsample is not None:
                    names.add(node.downsample.name)
            elif isinstance(node, UnitSpec):
                names.add(node.name)
        return dataclasses.replace(self, act_on=frozenset(names))


# ---------------------------------------------------------------------------
# Primitive forward ops
# ---------------------------------------------------------------------------

def _activation(name: Optional[str], x):
    if name is None:
        return x
    if name == "relu":
        return jax.nn.relu(x)
    if name == "relu6":
        return jnp.clip(x, 0.0, 6.0)
    raise ValueError(f"unknown activation {name}")


def conv2d(x_nhwc, w_oihw, b, stride, padding, groups, precision=None,
           preferred_element_type=None):
    """NHWC conv with torch-layout weights (transposed to HWIO at the call).

    ``precision``: pass jax.lax.Precision.HIGHEST where f32 fidelity matters
    on TPU (whose DEFAULT f32 convs run reduced-precision bf16 passes) —
    e.g. the deploy path's head/stem fallback feeding 4-bit quantizers.
    ``preferred_element_type``: accumulator dtype (e.g. f32 for bf16
    operands on the deploy 2-pass split path); defaults to the input dtype.
    """
    w = jnp.transpose(w_oihw, (2, 3, 1, 0))  # OIHW -> HWIO
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    out = jax.lax.conv_general_dilated(
        x_nhwc, w, window_strides=stride, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=preferred_element_type or x_nhwc.dtype,
        precision=precision)
    if b is not None:
        out = out + b
    return out


def linear(x, w_oi, b):
    out = x @ w_oi.T
    if b is not None:
        out = out + b
    return out


def max_pool(x, window, stride, padding):
    pads = ((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window[0], window[1], 1), (1, stride[0], stride[1], 1), pads)


def global_avg_pool(x):
    return x.mean(axis=(1, 2))


# ---------------------------------------------------------------------------
# Interpreter
# ---------------------------------------------------------------------------

class _Ctx:
    """Mutable trace-time context for one interpreter pass."""
    __slots__ = ("flags", "mode", "act_bits", "act_sym", "act_method",
                 "new_aq", "capture", "cap_in", "cap_out", "done",
                 "dyn_wq", "multi", "multi_out", "inject")

    def __init__(self, flags, mode, act_bits, act_sym, act_method, capture,
                 dyn_wq=None, multi=None, inject=None):
        self.flags = flags
        self.mode = mode                  # 'run' | 'init_act'
        self.act_bits = act_bits          # dict name -> n_bits (init_act mode)
        self.act_sym = act_sym
        self.act_method = act_method
        self.new_aq = {}
        self.capture = capture
        self.cap_in = None
        self.cap_out = None
        self.done = False
        # dynamic per-unit weight-quant gates (name -> bool scalar tracer):
        # lets ONE compiled graph serve every quantized-prefix combination
        # (the per-layer asym capture would otherwise compile a fresh graph
        # per prefix — ~2N remote compiles per model)
        self.dyn_wq = dyn_wq or {}
        # multi-capture: set of node names whose (input, output) to record
        self.multi = multi
        self.multi_out = {}
        # output injection: (name, tensor) — replace that node's output,
        # making downstream a pure function of the injected value (for
        # gradients at intermediates; replaces backward hooks)
        self.inject = inject


def _apply_act_quant(name: str, x, aq: Optional[QParams], ctx: _Ctx):
    if ctx.mode == "init_act":
        n_bits = ctx.act_bits[name]
        qp = Q.init_act_qparams(x, n_bits, sym=ctx.act_sym,
                                scale_method=ctx.act_method)
        ctx.new_aq[name] = qp
        return fake_quant(x, qp)
    if aq is None:
        raise ValueError(f"act quantizer for {name!r} not calibrated")
    if isinstance(aq, QParams):
        return fake_quant(x, aq)
    return aq(x)   # e.g. ActShiftQuant (callable quantizer pytree)


def _unit_forward(spec: UnitSpec, p, uq: UnitQuant, x, ctx: _Ctx):
    from .ops import wquant  # local import to avoid cycle

    wq_on = spec.name in ctx.flags.weight_on
    aq_on = spec.name in ctx.flags.act_on and not spec.disable_act_quant
    if ctx.mode == "init_act":
        aq_on = spec.name in ctx.act_bits and not spec.disable_act_quant

    w, b = p["w"], p.get("b")
    if spec.name in ctx.dyn_wq:
        # dynamic gate: compute both and select (fake-quant is cheap vs
        # the conv; keeps the graph prefix-independent)
        w = jnp.where(ctx.dyn_wq[spec.name],
                      wquant.apply_weight_quant(uq.wq, w), w)
    elif wq_on:
        w = wquant.apply_weight_quant(uq.wq, w)
    if spec.kind == "conv":
        out = conv2d(x, w, b, spec.stride, spec.padding, spec.groups)
    else:
        out = linear(x, w, b)
    if wq_on and ctx.flags.output_affine and uq.alpha_out is not None:
        # gamma^z / phi^z output affine (reference quant_layer.py:258-259);
        # broadcast over NHWC channel axis.
        out = out * uq.alpha_out + uq.beta_out
    out = _activation(spec.activation, out)
    if aq_on:
        out = _apply_act_quant(spec.name, out, uq.aq, ctx)
    return out


def _maybe_capture_pre(name, x, ctx: _Ctx):
    if ctx.capture == name:
        ctx.cap_in = x
    if ctx.multi is not None and name in ctx.multi:
        ctx.multi_out.setdefault(name, [None, None])[0] = x


def _maybe_capture_post(name, out, ctx: _Ctx):
    if ctx.capture == name:
        ctx.cap_out = out
        ctx.done = True
    if ctx.multi is not None and name in ctx.multi:
        ctx.multi_out.setdefault(name, [None, None])[1] = out
    if ctx.inject is not None and ctx.inject[0] == name:
        return ctx.inject[1]
    return out


def _node_forward(node: Node, params, qstate, x, ctx: _Ctx):
    if isinstance(node, OpSpec):
        if node.op == "maxpool":
            return max_pool(x, node.window, node.stride, node.padding)
        if node.op == "gap":
            return global_avg_pool(x)
        if node.op == "flatten":
            return x.reshape(x.shape[0], -1)
        raise ValueError(f"unknown op {node.op}")

    if isinstance(node, UnitSpec):
        _maybe_capture_pre(node.name, x, ctx)
        out = _unit_forward(node, params[node.name], qstate[node.name], x, ctx)
        out = _maybe_capture_post(node.name, out, ctx)
        return out

    # BlockSpec — mirror of reference quant_block.py:99-117 forward
    _maybe_capture_pre(node.name, x, ctx)
    residual = x
    if node.downsample is not None:
        _maybe_capture_pre(node.downsample.name, x, ctx)
        residual = _unit_forward(node.downsample, params[node.downsample.name],
                                 qstate[node.downsample.name], x, ctx)
        residual = _maybe_capture_post(node.downsample.name, residual, ctx)
    out = x
    for u in node.units:
        _maybe_capture_pre(u.name, out, ctx)
        out = _unit_forward(u, params[u.name], qstate[u.name], out, ctx)
        out = _maybe_capture_post(u.name, out, ctx)
        if ctx.done:
            return out
    if node.residual:
        out = out + residual
    out = _activation(node.post_activation, out)
    aq_on = node.name in ctx.flags.act_on and node.block_act_quant
    if ctx.mode == "init_act":
        aq_on = node.name in ctx.act_bits and node.block_act_quant
    if aq_on:
        out = _apply_act_quant(node.name, out, qstate.get(node.name), ctx)
    out = _maybe_capture_post(node.name, out, ctx)
    return out


def forward(graph: Graph, params, qstate, x, flags: Flags = Flags(),
            capture: Optional[str] = None):
    """Run the model. If ``capture`` names a node, returns (node_in, node_out)
    computed under ``flags`` and skips the rest of the network (the
    reference's hook + StopForwardException early exit). Otherwise returns
    the network output."""
    ctx = _Ctx(flags, "run", None, None, None, capture)
    out = x
    for node in graph:
        out = _node_forward(node, params, qstate, out, ctx)
        if ctx.done:
            return ctx.cap_in, ctx.cap_out
    if capture is not None:
        raise KeyError(f"capture target {capture!r} not found in graph")
    return out


def forward_multi_capture(graph: Graph, params, qstate, x, dyn_wq: dict,
                          targets, flags: Flags = Flags()):
    """One graph for every asym-capture need: run the full model with
    DYNAMIC per-unit weight-quant gates (``dyn_wq``: unit name -> bool
    scalar) and record (input, output) of every node in ``targets``.

    Compiled once, this serves all quantized-prefix combinations of the
    sequential reconstruction loop (prefix = gate vector) AND the all-FP
    target capture (all gates off) — replacing ~2N per-prefix compiles.
    Returns {name: (node_in, node_out)}.
    """
    ctx = _Ctx(flags, "run", None, None, None, None,
               dyn_wq=dyn_wq, multi=frozenset(targets))
    out = x
    for node in graph:
        out = _node_forward(node, params, qstate, out, ctx)
    missing = set(targets) - set(ctx.multi_out)
    if missing:
        raise KeyError(f"capture targets not found: {missing}")
    return {k: (v[0], v[1]) for k, v in ctx.multi_out.items()}


def apply_node(node: Node, params, qstate, x, flags: Flags = Flags()):
    """Forward a single unit/block on its own input — the subject of a
    reconstruction step (the reference's ``layer(cur_inp)`` /
    ``block(cur_inp)``, layer_recon_fused_shiftedScale.py:100,186)."""
    ctx = _Ctx(flags, "run", None, None, None, None)
    return _node_forward(node, params, qstate, x, ctx)


def apply_node_multi_capture(node: Node, params, qstate, x, flags: Flags,
                             targets):
    """Forward a single node recording (input, output) of the named inner
    sites (units and/or the node itself). Returns (out, {name: (in, out)})."""
    ctx = _Ctx(flags, "run", None, None, None, None,
               multi=frozenset(targets))
    out = _node_forward(node, params, qstate, x, ctx)
    return out, {k: (v[0], v[1]) for k, v in ctx.multi_out.items()}


def forward_from(graph: Graph, params, qstate, after: str, t,
                 flags: Flags = Flags()):
    """Resume the forward from the output of top-level node ``after`` —
    used to differentiate the network output w.r.t. an intermediate
    activation (the reference reads this gradient via a backward hook,
    data_utils.py:155-192). For targets nested inside blocks use
    forward_inject instead."""
    ctx = _Ctx(flags, "run", None, None, None, None)
    seen = False
    out = t
    for node in graph:
        if not seen:
            if node.name == after:
                seen = True
            continue
        out = _node_forward(node, params, qstate, out, ctx)
    if not seen:
        raise KeyError(after)
    return out


def forward_inject(graph: Graph, params, qstate, x, target: str, t,
                   flags: Flags = Flags()):
    """Full forward with ``target``'s output REPLACED by ``t`` — downstream
    is then a pure function of ``t``, so jax.grad of a loss on the result
    w.r.t. ``t`` is the gradient at that intermediate activation (works for
    units nested inside blocks, where resuming from the output alone is
    impossible because the residual path needs the block input)."""
    ctx = _Ctx(flags, "run", None, None, None, None, inject=(target, t))
    out = x
    for node in graph:
        out = _node_forward(node, params, qstate, out, ctx)
    return out


def prefix_flags_till(graph: Graph, target: str, act_quant: bool = False,
                      base: Flags = Flags()) -> Flags:
    """Weight (and optionally act) quant enabled for every unit up to AND
    INCLUDING ``target`` (the reference's quantize_model_till,
    data_utils.py:195-206) — in module-registration order, so a per-unit
    target inside a block quantizes only the block units preceding it."""
    w_on, a_on = set(base.weight_on), set(base.act_on)

    def add_unit(u: UnitSpec):
        w_on.add(u.name)
        if act_quant:
            a_on.add(u.name)

    for node in graph:
        if isinstance(node, OpSpec):
            continue
        if isinstance(node, UnitSpec):
            add_unit(node)
            if node.name == target:
                return dataclasses.replace(base, weight_on=frozenset(w_on),
                                           act_on=frozenset(a_on))
            continue
        for u in list(node.units) + ([node.downsample]
                                     if node.downsample else []):
            add_unit(u)
            if u.name == target:
                return dataclasses.replace(base, weight_on=frozenset(w_on),
                                           act_on=frozenset(a_on))
        if act_quant:
            a_on.add(node.name)   # block act site
        if node.name == target:
            return dataclasses.replace(base, weight_on=frozenset(w_on),
                                       act_on=frozenset(a_on))
    return dataclasses.replace(base, weight_on=frozenset(w_on),
                               act_on=frozenset(a_on))


def node_unit_names(node: Node):
    """Unit names inside a node (downsample included), in the reference's
    module-iteration order."""
    if isinstance(node, UnitSpec):
        return [node.name]
    names = [u.name for u in node.units]
    if node.downsample is not None:
        names.append(node.downsample.name)
    return names


def init_act_quant(graph: Graph, params, qstate, x, flags: Flags,
                   act_bits: dict, act_sym: bool = False,
                   scale_method: str = "mse"):
    """Single-pass activation-scale calibration.

    Runs the network on ``x`` (typically cali_data[:64], reference
    ShiftedScaleQuant.py:229) under ``flags`` (weight quant typically on);
    at every act-quant site listed in ``act_bits`` (name -> n_bits), computes
    the scale init from the tensor at that site and quantizes with it before
    continuing — the reference's lazy-init-on-first-forward semantics
    (quant_layer.py:77-89) as one pure function. Returns {name: QParams}.
    """
    ctx = _Ctx(flags, "init_act", act_bits, act_sym, scale_method, None)
    out = x
    for node in graph:
        out = _node_forward(node, params, qstate, out, ctx)
    return ctx.new_aq
