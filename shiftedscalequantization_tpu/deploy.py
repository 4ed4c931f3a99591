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
    return plan


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

    Producer sites re-quantize their float output onto the act grid (exact
    fake-quant, VPU); int8-planned consumers re-derive the centered codes
    from the on-grid float (exact) and run the int conv. Residual adds and
    epilogues are float32, mirroring sim mode.
    """
    if plan is None:
        plan = make_deploy_plan(graph, dparams, act_steps)

    def fake_q(t, site):
        st = act_steps.get(site)
        if st is None:
            return t
        delta, zp, n_bits = st
        q = jnp.clip(jnp.round(t / delta) + zp, 0, 2 ** n_bits - 1)
        return (q - zp) * delta

    def run_unit(spec: UnitSpec, t):
        d = dparams[spec.name]
        kind, site = plan[spec.name]
        st = act_steps.get(site) if site else None
        if kind == "int8":
            delta, zp, n_bits = st
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
            xf = t.astype(jnp.float32)
            if d.w_bf16 is not None:
                w_eff, sc = d.w_bf16, d.scale
            else:
                w_eff = d.w_int.astype(jnp.float32) * d.scale.reshape(
                    (-1,) + (1,) * (d.w_int.ndim - 1))
                sc = None
            if spec.kind == "conv":
                out = conv2d(xf, w_eff, None, spec.stride, spec.padding,
                             spec.groups).astype(jnp.float32)
            else:
                out = (xf @ w_eff.T).astype(jnp.float32)
            if sc is not None:
                out = out * sc
            out = out + d.bias
        return _activation(spec.activation, out)

    out = x
    for node in graph:
        if isinstance(node, OpSpec):
            if node.op == "maxpool":
                out = max_pool(out, node.window, node.stride, node.padding)
            elif node.op == "gap":
                out = global_avg_pool(out)
            elif node.op == "flatten":
                out = out.reshape(out.shape[0], -1)
        elif isinstance(node, UnitSpec):
            out = fake_q(run_unit(node, out), node.name)
        else:  # BlockSpec
            residual = out if node.downsample is None \
                else run_unit(node.downsample, out)
            t = out
            for u in node.units:
                t = fake_q(run_unit(u, t), u.name)
            if node.residual:
                t = t + residual
            t = _activation(node.post_activation, t)
            out = fake_q(t, node.name)
    return out
