"""Deploy-mode (true integer) inference path.

The reference has NO real integer execution — everything is fp32 fake-quant
on top of F.conv2d (quant_layer.py:196-202, 245-280). This module is the
TPU-native deploy story: hardened quantizer state is converted offline into
centered integer weight codes + per-out-channel scales, and inference runs
int8 x int8 -> int32 convolutions on the MXU with a fused dequant epilogue.

Math: with centered codes x_c = clip(round(x/dx)+zp_x, lo, hi)-zp_x and
w_c = w_q-zp_w, the fake-quant conv is EXACTLY
    conv(x_hat, w_hat) = dx * dw_oc * conv_int(x_c, w_c)
so the deploy path matches sim mode bit-for-bit up to float epilogue
rounding, with no zero-point correction terms. gamma^z/phi^z
(alpha_out/beta_out) and the conv bias fold into the epilogue scale/offset.

W2/W4 codes are stored as int8 (the MXU consumes int8 operands; sub-byte
packing is a memory-format optimization layered underneath in the Pallas
kernels). Units whose centered codes exceed int8 range (asymmetric 8-bit
head/stem) fall back to bf16 weights — standard practice for head/stem.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .graph import BlockSpec, Graph, OpSpec, UnitSpec, _activation, conv2d, \
    global_avg_pool, iter_units, max_pool
from .ops import wquant as W


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeployUnit:
    """Execution-ready unit parameters (weights pre-converted offline)."""
    w_int: Optional[jax.Array]     # int8 centered weight codes (OIHW / OI)
    w_bf16: Optional[jax.Array]    # float fallback weights (8-bit asym units)
    scale: jax.Array               # per-OC epilogue scale (dw * alpha_out)
    bias: jax.Array                # folded bias (* alpha_out + beta_out)


def _hard_weight_codes(wq, w):
    """(integer codes, zp, per-OC delta) for a hardened weight quantizer."""
    if isinstance(wq, W.UniformWQ):
        delta = W._bshape(wq.qp.delta, w)
        zp = W._bshape(wq.qp.zero_point, w)
        lo, hi = wq.qp.qrange()
        codes = jnp.clip(jnp.round(w / delta) + zp, lo, hi)
        return codes, zp, wq.qp.delta
    if isinstance(wq, W.AdaRoundWQ):
        delta = W._bshape(wq.qp.delta, w)
        zp = W._bshape(wq.qp.zero_point, w)
        x_int = jnp.floor(w / delta) + (wq.alpha >= 0).astype(w.dtype)
        if wq.signed_clamp and wq.qp.sym:
            lo, hi = -(wq.qp.n_levels // 2), wq.qp.n_levels // 2 - 1
        else:
            lo, hi = 0, wq.qp.n_levels - 1
        return jnp.clip(x_int + zp, lo, hi), zp, wq.qp.delta
    if isinstance(wq, W.ShiftedScaleWQ) and wq.codes:
        # fused path: hard-selected floor codes + hard round, dequantized at
        # the base per-OC delta -> a PLAIN int tensor (channelQuant.py:49-64)
        zp = W._bshape(wq.qp.zero_point, w)
        onehot = jax.nn.one_hot(jnp.argmax(wq.soft_targets(), -1),
                                len(wq.shift_targets), dtype=w.dtype)
        x_int = W._mix(wq.x_q, onehot) + (wq.beta >= 0).astype(w.dtype)
        lo, hi = wq.qp.qrange()
        return jnp.clip(x_int + zp, lo, hi), zp, wq.qp.delta
    raise NotImplementedError(
        f"deploy conversion for {type(wq).__name__} (two-phase "
        "dequant-shifted state needs the per-(oc,ic) scale-table epilogue)")


def build_deploy_params(graph: Graph, params, qstate,
                        output_affine: bool = False) -> dict:
    """Convert hardened qstate + folded params into {name: DeployUnit}."""
    out = {}
    for u in iter_units(graph):
        uq = qstate[u.name]
        w = params[u.name]["w"]
        b = params[u.name].get("b")
        b = jnp.zeros((u.out_ch,), w.dtype) if b is None else b
        codes, zp, delta_oc = _hard_weight_codes(uq.wq, w)
        centered = codes - zp
        scale_oc = jnp.reshape(delta_oc, (-1,))
        a_out = uq.alpha_out if (output_affine and uq.alpha_out is not None) \
            else jnp.ones((u.out_ch,), w.dtype)
        b_out = uq.beta_out if (output_affine and uq.beta_out is not None) \
            else jnp.zeros((u.out_ch,), w.dtype)
        cmax = float(jnp.max(jnp.abs(centered)))
        if cmax <= 127:
            out[u.name] = DeployUnit(
                w_int=centered.astype(jnp.int8), w_bf16=None,
                scale=scale_oc * a_out, bias=b * a_out + b_out)
        else:
            # float32, not bf16: fallback units feed 4-bit act quantizers
            # whose coarse steps amplify bf16 drift across rounding
            # boundaries; only the asym-8-bit head/stem lands here so the
            # cost is negligible
            w_eff = centered * W._bshape(delta_oc, w)
            out[u.name] = DeployUnit(
                w_int=None, w_bf16=w_eff, scale=a_out, bias=b * a_out + b_out)
    return out


def act_steps_from_qstate(graph: Graph, qstate) -> dict:
    """site name -> (delta, zero_point, n_bits) for every calibrated act
    quantizer (unit sites and block sites)."""
    from .graph import UnitQuant
    steps = {}
    for name, v in qstate.items():
        if isinstance(v, UnitQuant):
            if v.aq is not None:
                steps[name] = (v.aq.delta, v.aq.zero_point, v.aq.n_bits)
        elif v is not None:  # block-level QParams
            steps[name] = (v.delta, v.zero_point, v.n_bits)
    return steps


def _feeding_sites(graph: Graph, act_steps: dict) -> dict:
    """For each unit: the act-quant site whose step governs the tensor
    feeding it (None = unquantized float input, e.g. the raw image)."""
    feed = {}
    current = "__input__"
    for node in graph:
        if isinstance(node, OpSpec):
            # maxpool preserves the quant grid (max of on-grid values);
            # gap/avgpool produce off-grid means -> consumer must not
            # requantize with the producer's step
            if node.op in ("gap", "avgpool"):
                current = "__offgrid__"
            continue
        if isinstance(node, UnitSpec):
            feed[node.name] = current if current in act_steps else None
            current = node.name
            continue
        if node.downsample is not None:
            feed[node.downsample.name] = current if current in act_steps else None
        prev = current
        for u in node.units:
            feed[u.name] = prev if prev in act_steps else None
            prev = u.name
        current = node.name
    return feed


def make_deploy_plan(graph: Graph, dparams: dict, act_steps: dict) -> dict:
    """Static execution plan: unit -> ('int8'|'bf16', feeding site).

    int8 requires (a) int weight codes and (b) the feeding activation's
    centered codes to fit int8 — an 8-bit act site with zp~0 spans 0..255
    and must take the bf16 path (head/stem consumers). Computed once on
    concrete values so the forward itself is jittable."""
    import numpy as np
    feed = _feeding_sites(graph, act_steps)
    plan = {}
    for u in iter_units(graph):
        d = dparams[u.name]
        site = feed[u.name]
        ok = d.w_int is not None and site is not None
        if ok:
            delta, zp, n_bits = act_steps[site]
            zpv = float(np.asarray(zp).reshape(-1)[0])
            ok = ((2 ** n_bits - 1) - zpv <= 127) and (-zpv >= -128)
        plan[u.name] = ("int8" if ok else "bf16", site)
    plan["__int8_sites__"] = frozenset(
        s for s in act_steps if _site_fits_int8_concrete(act_steps[s]))
    return plan


def _site_fits_int8_concrete(st):
    import numpy as np
    _, zp, n_bits = st
    zpv = float(np.asarray(zp).reshape(-1)[0])
    return ((2 ** n_bits - 1) - zpv <= 127) and (-zpv >= -128)


def _quant_centered(x, delta, zp, n_bits):
    q = jnp.clip(jnp.round(x / delta) + zp, 0, 2 ** n_bits - 1)
    return (q - zp).astype(jnp.int8)


def _int_conv(x_int8, w_int8_oihw, stride, padding, groups):
    w = jnp.transpose(w_int8_oihw, (2, 3, 1, 0))
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    return jax.lax.conv_general_dilated(
        x_int8, w, window_strides=stride, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)


def deploy_forward(graph: Graph, dparams: dict, act_steps: dict, x,
                   plan: Optional[dict] = None):
    """Integer inference. ``act_steps`` from act_steps_from_qstate; ``plan``
    from make_deploy_plan (computed here if omitted — precompute it when
    wrapping this function in jit).

    Inter-unit activations travel as CENTERED INT8 CODES wherever the act
    grid fits int8: a producer site quantizes its float epilogue output once
    (int8 = 4x less HBM traffic than f32, and maxpool operates on codes
    directly since quantization is monotonic); the consumer feeds the codes
    straight into the int8 MXU conv. Float (f32) is used only where sim-mode
    semantics require it: residual adds, off-grid segments (gap -> fc), and
    the 8-bit head/stem whose codes exceed int8. Numerically identical to
    the fake-quant sim path (single rounding per grid, exact epilogue
    algebra).

    Value representation between nodes: ('codes', int8_codes, site) or
    ('f32', tensor, None).
    """
    if plan is None:
        plan = make_deploy_plan(graph, dparams, act_steps)
    _int8_sites = plan["__int8_sites__"]

    def to_float(v):
        kind, t, site = v
        if kind == "f32":
            return t
        delta, zp, _ = act_steps[site]
        return t.astype(jnp.float32) * delta

    def quantize_out(t_float, site):
        """Producer-side quantization onto the site grid."""
        st = act_steps.get(site)
        if st is None:
            return ("f32", t_float, None)
        delta, zp, n_bits = st
        if site in _int8_sites:
            return ("codes", _quant_centered(t_float, delta, zp, n_bits),
                    site)
        q = jnp.clip(jnp.round(t_float / delta) + zp, 0, 2 ** n_bits - 1)
        return ("f32", (q - zp) * delta, None)

    def run_unit(spec: UnitSpec, v):
        d = dparams[spec.name]
        kind_plan, feed_site = plan[spec.name]
        vkind, t, vsite = v
        if kind_plan == "int8":
            delta, zp, n_bits = act_steps[feed_site]
            if vkind == "codes":
                xi = t
            else:
                xi = _quant_centered(t, delta, zp, n_bits)
            if spec.kind == "conv":
                acc = _int_conv(xi, d.w_int, spec.stride, spec.padding,
                                spec.groups)
            else:
                acc = jax.lax.dot_general(
                    xi, d.w_int.T, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * (d.scale * delta) + d.bias
        else:
            xf = to_float(v)
            if d.w_bf16 is not None:
                w_eff, sc = d.w_bf16, d.scale
            else:
                w_eff = d.w_int.astype(jnp.float32) * d.scale.reshape(
                    (-1,) + (1,) * (d.w_int.ndim - 1))
                sc = None
            if spec.kind == "conv":
                # HIGHEST: TPU default f32 convs run reduced-precision bf16
                # passes whose drift flips 4-bit act codes downstream
                out = conv2d(xf, w_eff, None, spec.stride, spec.padding,
                             spec.groups,
                             precision=jax.lax.Precision.HIGHEST
                             ).astype(jnp.float32)
            else:
                out = jnp.matmul(
                    xf, w_eff.T,
                    precision=jax.lax.Precision.HIGHEST).astype(jnp.float32)
            if sc is not None:
                out = out * sc
            out = out + d.bias
        return _activation(spec.activation, out)

    v = ("f32", x, None)
    for node in graph:
        if isinstance(node, OpSpec):
            kind, t, site = v
            if node.op == "maxpool":
                # monotonic: pool codes directly (int8) or floats
                if kind == "codes":
                    pads = ((0, 0), (node.padding[0], node.padding[0]),
                            (node.padding[1], node.padding[1]), (0, 0))
                    t = jax.lax.reduce_window(
                        t, jnp.int8(-128), jax.lax.max,
                        (1, *node.window, 1), (1, *node.stride, 1), pads)
                    v = (kind, t, site)
                else:
                    v = (kind, max_pool(t, node.window, node.stride,
                                        node.padding), site)
            elif node.op == "gap":
                v = ("f32", global_avg_pool(to_float(v)), None)
            elif node.op == "flatten":
                v = ("f32", to_float(v).reshape(t.shape[0], -1), None)
        elif isinstance(node, UnitSpec):
            v = quantize_out(run_unit(node, v), node.name)
        else:  # BlockSpec
            residual_f = None
            if node.residual:
                residual_f = run_unit(node.downsample, v) \
                    if node.downsample is not None else to_float(v)
            t = v
            for u in node.units:
                t = quantize_out(run_unit(u, t), u.name)
            tf = to_float(t)
            if node.residual:
                tf = tf + residual_f
            tf = _activation(node.post_activation, tf)
            v = quantize_out(tf, node.name)
    return to_float(v)
