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
kernels). Units whose centered codes exceed int8 (asymmetric 8-bit
head/stem) keep exact f32 integer codes and run Precision.HIGH convs;
8-bit-unsigned-fed consumers split the codes into two nibbles and run two
int8 MXU convs (exact). Activations travel between units as int8 codes
(centered, or biased by 128 for 8-bit unsigned sites).
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
    w_fp: Optional[jax.Array]      # f32 centered codes when |codes| > 127
                                   # (8-bit asym units) — still exact
                                   # integers, bf16-representable
    scale: jax.Array               # per-OC epilogue scale (dw * alpha_out)
    bias: jax.Array                # folded bias (* alpha_out + beta_out)
    # two-phase baked-shift units (per-(oc,ic) effective deltas): codes
    # split into |S| IC/pair-masked groups, each with its own per-OC scale
    # — the "per-(oc, ic-group) scale-table epilogue" of SURVEY.md §7:
    # out = sum_s int_conv(x, w_groups[s]) * group_scales[s]
    w_groups: Optional[jax.Array] = None      # (S, ...) int8 masked codes
    group_scales: Optional[jax.Array] = None  # (S, OC) f32
    # sub-byte packed form (fc / 1x1 convs at W2/W4): raw codes packed
    # 16/8-per-int32 (ops/pallas/packed.py) for the memory-bound serving
    # regime — 4x/2x less weight HBM traffic than int8 codes
    w_packed: Optional[jax.Array] = None      # (ceil(K/f), OC) int32
    w_pack_zp: Optional[jax.Array] = None     # (OC,) weight zero points
    w_pack_bits: int = dataclasses.field(default=0, metadata=dict(static=True))
    # block-diagonal densification of a narrow grouped conv (RegNetX):
    # when total in_ch <= 128 the dense form still fits ONE MXU lane tile,
    # so the redundant off-diagonal zeros cost nothing while the grouped
    # form pays per-group dispatch — measured 2.2x faster on the 48ch/g2
    # 112px stage (grouped_conv_probe.py). Exact: zeros contribute 0.
    w_int_bd: Optional[jax.Array] = None      # (OC, IC, KH, KW) int8


def _hard_weight_codes(wq, w):
    """(integer codes, zp, per-OC delta) for a hardened weight quantizer."""
    if isinstance(wq, W.UniformWQ):
        delta = W._bshape(wq.qp.delta, w)
        zp = W._bshape(wq.qp.zero_point, w)
        lo, hi = wq.qp.qrange()
        codes = jnp.clip(jnp.round(w / delta) + zp, lo, hi)
        return codes, zp, wq.qp.delta
    if isinstance(wq, W.AdaRoundWQ):
        delta = wq._delta(w)
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
        baked = (isinstance(uq.wq, W.AdaRoundWQ)
                 and uq.wq.st_index is not None)
        if baked and cmax <= 127:
            # grouped scale-table form: mask codes per shift candidate
            sts = uq.wq.shift_targets
            idx = uq.wq.st_index
            if idx.ndim == 1 and w.ndim == 4:      # conv: per-IC
                idx_b = idx.reshape(1, -1, 1, 1)
            else:
                idx_b = idx
            groups = jnp.stack([
                jnp.where(jnp.broadcast_to(idx_b, w.shape) == s,
                          centered, 0).astype(jnp.int8)
                for s in range(len(sts))])
            gscales = jnp.stack([scale_oc * float(st) * a_out
                                 for st in sts])
            out[u.name] = DeployUnit(
                w_int=centered.astype(jnp.int8), w_fp=None,
                scale=scale_oc * a_out, bias=b * a_out + b_out,
                w_groups=groups, group_scales=gscales)
        elif cmax <= 127:
            du = DeployUnit(
                w_int=centered.astype(jnp.int8), w_fp=None,
                scale=scale_oc * a_out, bias=b * a_out + b_out)
            # narrow grouped conv (not depthwise): densified block-diagonal
            # codes for the int8_bd plan kind (see DeployUnit.w_int_bd)
            if (u.kind == "conv" and 1 < u.groups < u.in_ch
                    and u.in_ch <= 128):
                gw = u.in_ch // u.groups
                ocg = u.out_ch // u.groups
                dense = jnp.zeros(
                    (u.out_ch, u.in_ch) + centered.shape[2:], jnp.int8)
                for g in range(u.groups):
                    dense = dense.at[g * ocg:(g + 1) * ocg,
                                     g * gw:(g + 1) * gw].set(
                        centered[g * ocg:(g + 1) * ocg].astype(jnp.int8))
                du = dataclasses.replace(du, w_int_bd=dense)
            # sub-byte packed form for fc / 1x1 convs at W2/W4 (SSQ_PACKED
            # deploy plan kind): raw codes in [0, 2^bits) packed K-major
            n_bits_w = uq.wq.qp.n_bits
            flat_1x1 = (u.kind == "linear"
                        or (u.kind == "conv" and u.kernel == (1, 1)
                            and u.groups == 1 and u.padding == (0, 0)))
            if flat_1x1 and n_bits_w in (2, 4):
                from .ops.pallas.packed import pack_codes
                # raw = codes - qlo maps any clip range onto [0, 2^bits)
                qlo = min(float(jnp.min(codes)), 0.0)
                raw = (codes - qlo).astype(jnp.int32).reshape(u.out_ch, -1)
                if float(jnp.max(raw)) < 2 ** n_bits_w:
                    du = dataclasses.replace(
                        du,
                        w_packed=pack_codes(raw.T, n_bits_w),
                        w_pack_zp=(jnp.reshape(zp, (-1,)) - qlo)
                        .astype(jnp.float32),
                        w_pack_bits=n_bits_w)
            out[u.name] = du
        else:
            # 8-bit asym head/stem: keep exact integer codes in f32 and
            # fold delta into the epilogue scale (codes are
            # bf16-representable -> Precision.HIGH convs stay exact in w).
            # Baked-shift units landing here fold st into the stored codes
            # (no longer integral for non-dyadic targets; HIGH still ~f32).
            w_fp = centered
            if baked:
                sts = jnp.asarray(uq.wq.shift_targets, w.dtype)
                idx = uq.wq.st_index
                if idx.ndim == 1 and w.ndim == 4:
                    idx = idx.reshape(1, -1, 1, 1)
                w_fp = centered * jnp.broadcast_to(sts[idx], w.shape)
            out[u.name] = DeployUnit(
                w_int=None, w_fp=w_fp, scale=scale_oc * a_out,
                bias=b * a_out + b_out)
    return out


def act_steps_from_qstate(graph: Graph, qstate) -> dict:
    """site name -> (delta, zero_point, n_bits) for every calibrated act
    quantizer (unit sites and block sites). ActShiftQuant sites fold their
    hardened per-channel scale selection into a per-channel delta (the
    producer-side requant-step folding promised in ops/act_quant.py)."""
    from .graph import UnitQuant
    from .ops.act_quant import ActShiftQuant

    def step_of(aq):
        if isinstance(aq, ActShiftQuant):
            return (aq.effective_delta(), aq.qp.zero_point, aq.qp.n_bits)
        return (aq.delta, aq.zero_point, aq.n_bits)

    steps = {}
    for name, v in qstate.items():
        if isinstance(v, UnitQuant):
            if v.aq is not None:
                steps[name] = step_of(v.aq)
        elif v is not None:  # block-level quantizer
            steps[name] = step_of(v)
    return steps


def _chain_sum_sites(graph: Graph, act_steps: dict) -> dict:
    """Synthetic act sites for siteless residual blocks whose operand
    grids share one scalar step (quantize.harmonize_residual_chains): the
    centered-code SUM is then exact on that shared grid, so the block
    output can travel as int8 codes instead of an f32 edge. Registered as
    '<block>__sum__' -> (delta, 0, n_bits) with the BASE grid's n_bits
    (consumers of 'codes' only read delta); a chain is registered only
    while its cumulative centered-code bound fits int8.

    Returns {sum_site: (delta, zp0, n_bits)}; callers merge into
    act_steps and add the names to the int8-transport set."""
    import numpy as np
    out = {}
    current = None            # (site_name, centered_bound) of flowing tensor
    for node in graph:
        if isinstance(node, OpSpec):
            if node.op in ("gap", "avgpool", "flatten"):
                current = None
            continue

        def bound_of(site):
            st = act_steps.get(site)
            if st is None or not _scalar_step(st):
                return None
            delta, zp, nb = st
            zpv = float(np.asarray(zp).reshape(-1)[0])
            return max(zpv, (2 ** nb - 1) - zpv)

        if isinstance(node, UnitSpec):
            b = bound_of(node.name)
            current = (node.name, b) if b is not None else None
            continue
        entry = current
        last = node.units[-1].name
        no_site = act_steps.get(node.name) is None
        if (node.residual and node.downsample is None
                and node.post_activation is None and no_site
                and entry is not None and bound_of(last) is not None):
            e_site, e_bound = entry
            d_e = float(np.asarray(
                (out.get(e_site) or act_steps[e_site])[0]).reshape(-1)[0])
            d_l = float(np.asarray(act_steps[last][0]).reshape(-1)[0])
            total = e_bound + bound_of(last)
            if d_e == d_l and total <= 127:
                name = f"{node.name}__sum__"
                out[name] = (act_steps[last][0], jnp.zeros_like(
                    act_steps[last][1]), act_steps[last][2])
                current = (name, total)
                continue
            current = None
        elif not node.residual and node.post_activation is None and no_site:
            b = bound_of(last)
            current = (last, b) if b is not None else None
        else:
            b = bound_of(node.name)
            current = (node.name, b) if b is not None else None
    return out


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
        # a block with no residual, no post-activation, and no block-level
        # act site passes the LAST UNIT's tensor through unchanged — its
        # site governs the next consumer (MNASNet is encoded per-unit with
        # no block sites; without this, every stage-opening expand conv
        # fell to the 2-pass float path)
        if (not node.residual and node.post_activation is None
                and node.name not in act_steps):
            current = prev
        elif f"{node.name}__sum__" in act_steps \
                and node.name not in act_steps:
            # harmonized siteless residual chain: the exact code SUM's
            # synthetic grid governs the next consumer (_chain_sum_sites)
            current = f"{node.name}__sum__"
        else:
            current = node.name
    return feed


def s2d_kernel(w_oihw: jax.Array) -> jax.Array:
    """Space-to-depth rewrite of a 7x7 stride-2 pad-3 conv kernel.

    With the input rearranged (B, 2H', 2W', C) -> (B, H', W', 4C) via
    x'[j, (ph, pw, c)] = x[2j+ph, ...], the conv becomes 4x4 stride-1 with
    asymmetric padding (2, 1): out[i] = sum_k K'[k] x'[i + k - 2] where
    K'[k, (ph, pw, c)] = K[2(k-2) + ph + 3] (zero outside [0, 7)).
    Exact — integer codes stay integers. ~4x better MXU utilization on the
    3-channel stem (the single biggest int8-path deficit on ResNet-18).
    """
    o, c, kh, kw = w_oihw.shape
    assert (kh, kw) == (7, 7)
    wp = jnp.zeros((o, 2, 2, c, 4, 4), w_oihw.dtype)
    for k_h in range(4):
        for ph in range(2):
            m_h = 2 * (k_h - 2) + ph + 3
            if not 0 <= m_h < 7:
                continue
            for k_w in range(4):
                for pw in range(2):
                    m_w = 2 * (k_w - 2) + pw + 3
                    if not 0 <= m_w < 7:
                        continue
                    wp = wp.at[:, ph, pw, :, k_h, k_w].set(
                        w_oihw[:, :, m_h, m_w])
    return wp.reshape(o, 4 * c, 4, 4)


def space_to_depth(x_nhwc: jax.Array) -> jax.Array:
    """(B, 2H', 2W', C) -> (B, H', W', 4C), channel order (ph, pw, c)."""
    b, h, w, c = x_nhwc.shape
    x = x_nhwc.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _unit_in_hw(graph: Graph, input_hw) -> dict:
    """unit name -> input spatial size, walking the graph like
    utils/profiling.graph_flops (downsample units see the block input)."""
    def conv_out(hw, u):
        return ((hw[0] + 2 * u.padding[0] - u.kernel[0]) // u.stride[0] + 1,
                (hw[1] + 2 * u.padding[1] - u.kernel[1]) // u.stride[1] + 1)

    hw = input_hw
    out = {}
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
        if isinstance(node, UnitSpec):
            out[node.name] = hw
            if node.kind == "conv":
                hw = conv_out(hw, node)
            continue
        if node.downsample is not None:
            out[node.downsample.name] = hw
        for u in node.units:
            out[u.name] = hw
            if u.kind == "conv":
                hw = conv_out(hw, u)
    return out


def make_deploy_plan(graph: Graph, dparams: dict, act_steps: dict,
                     input_hw=(224, 224)) -> dict:
    """Static execution plan: unit -> (kind, feeding site), kind in:

      'int8'      — feeding codes fit int8: single MXU int conv
      'int8_bd'   — narrow grouped conv run as a DENSE block-diagonal int8
                    conv (w_int_bd): in_ch <= 128 keeps the dense form in
                    one MXU lane tile, measured up to 2.2x over the grouped
                    bf16 path on RegNetX stage 1-2 (grouped_conv_probe.py)
      'int8_pair' — 8-bit unsigned feeding codes (zp==0): split q into
                    high/low nibbles, two int8 convs, acc = 16*hi + lo —
                    exact, and ~3x faster than the f32-HIGHEST fallback
                    (profiling: stem-fed layer1 was the entire int8-path
                    deficit on ResNet-18)
      'bf16_codes'— same integer codes but fed to the MXU as bf16 operands
                    with f32 accumulation: small-int codes are bf16-exact,
                    so this is numerically identical to the int conv while
                    using the bf16 MXU path — measured faster at THIN
                    channel counts (<128), where int8's (32,128) tiling
                    wastes lanes (ResNet-50 layer1 was 1.7x slower int8)
      'float'     — everything else (raw image input, no int weights, ...);
                    integer-code weights run at Precision.HIGH (codes are
                    exactly bf16-representable, so only the activation
                    splits — near-f32 at half the HIGHEST cost), true-float
                    weights at HIGHEST (bf16 drift flips low-bit act codes
                    downstream)

    Computed once on concrete values so the forward itself is jittable."""
    import os
    thin = int(os.environ.get("SSQ_THIN_CHANNELS", "128"))
    return _make_plan(graph, dparams, act_steps, use_s2d_stem=False,
                      thin_channels=thin, input_hw=input_hw)


def _make_plan(graph, dparams, act_steps, use_s2d_stem: bool,
               thin_channels: int = 128, input_hw=(224, 224)):
    import os

    import numpy as np
    sum_sites = _chain_sum_sites(graph, act_steps)
    act_steps = {**act_steps, **sum_sites}
    feed = _feeding_sites(graph, act_steps)
    int8_sites = frozenset(
        s for s in act_steps if _site_fits_int8_concrete(act_steps[s])
    ) | frozenset(sum_sites)
    # 8-bit unsigned sites (zp==0): transport as biased (q-128) int8 codes
    biased_sites = frozenset(
        s for s in act_steps
        if s not in int8_sites
        and _scalar_step(act_steps[s])
        and act_steps[s][2] == 8
        and float(np.asarray(act_steps[s][1]).reshape(-1)[0]) == 0.0)
    # fused Pallas stem (ops/pallas/stem.py): 7x7/s2/p3 relu conv on the
    # raw image followed by a 3x3/s2/p1 maxpool, with the unit's own act
    # site available for the fused requantize. The kernel emits int8 codes,
    # so the stem's own site must fit int8 transport (centered or biased).
    # OFF by default: measured 8.6 ms/batch-256 on v5e vs ~2.8 ms for the
    # XLA 2-pass bf16-split float path + fused quant + int8-code pool —
    # per-group VPU overhead (band-assembly stores + f32 quant epilogue,
    # ~590 cycles/group vs ~105 MXU cycles) dominates; see BENCHMARKS.md.
    # SSQ_STEM_KERNEL=1 enables.
    use_stem_kernel = os.environ.get("SSQ_STEM_KERNEL", "0") == "1"
    # OFF by default: the row-chunked VPU kernel compiles at every
    # MobileNetV2 shape but measures ~8x slower than the XLA bf16-codes
    # path at batch 256 (52 vs 11 ms/batch whole-net; per-image grid +
    # f32 plane MACs are far from VPU peak). SSQ_DW_KERNEL=1 enables.
    use_dw_kernel = os.environ.get("SSQ_DW_KERNEL", "0") == "1"
    # packed sub-byte weights (4x/2x less weight HBM): a win only in the
    # weight-bound serving regime (small batch), so opt-in via SSQ_PACKED=1
    use_packed = os.environ.get("SSQ_PACKED", "0") == "1"
    # single-pass bf16 stem (default): weights are integer codes
    # (bf16-exact), so dropping the x_lo correction pass only rounds the
    # activation at ~2^-9 relative — measured bit-identical final logits
    # vs the exact split on ResNet-18 W2A4 (the stem's own act requant
    # absorbs the rounding; stem_drift_check.py). SSQ_STEM_1PASS=0
    # restores the exact 2-pass split.
    stem_1pass = os.environ.get("SSQ_STEM_1PASS", "1") != "0"
    # OPT-IN single-pass bf16 for every float-kind unit whose weights are
    # integer codes (not just the <=4-channel stem): f32 edges appear
    # wherever sim semantics force exact transport (siteless residual
    # chains — MNASNet — gap->fc tails, per-channel act-shift sites), and
    # the 2-pass hi/lo activation split doubles the MXU cost of every conv
    # they feed. NOT a serving default: unlike the stem (whose own requant
    # absorbs the ~2^-9 activation rounding — measured bit-identical), the
    # rounding here lands on values feeding 4-bit act grids across long
    # siteless chains; flipped codes compound (measured 0.45 max rel logit
    # drift / 38% argmax agreement on random-weight W2A4 MNASNet). Kept as
    # SSQ_FLOAT_1PASS=1 for perf-ceiling probes only.
    float_1pass = os.environ.get("SSQ_FLOAT_1PASS", "0") == "1"
    nodes = list(graph)
    stem_unit = None
    if use_stem_kernel and len(nodes) >= 2:
        # the stem pattern can only open the graph
        nd, nxt = nodes[0], nodes[1]
        if (isinstance(nd, UnitSpec) and nd.kind == "conv"
                and nd.kernel == (7, 7) and nd.stride == (2, 2)
                and nd.padding == (3, 3) and nd.groups == 1
                and nd.in_ch == 3 and nd.activation == "relu"
                and nd.name in act_steps
                and (nd.name in int8_sites or nd.name in biased_sites)
                and isinstance(nxt, OpSpec) and nxt.op == "maxpool"
                and nxt.window == (3, 3) and nxt.stride == (2, 2)
                and nxt.padding == (1, 1)):
            stem_unit = nd.name
    unit_hw = _unit_in_hw(graph, input_hw)
    plan = {}
    for u in iter_units(graph):
        d = dparams[u.name]
        site = feed[u.name]
        kind = "float"
        thin = min(u.out_ch, u.in_ch // u.groups) < thin_channels
        # narrow grouped convs (RegNetX f.b, group width < 128): the thin
        # rule misjudges them — measured on v5e (grouped_conv_probe.py) the
        # int8 paths beat grouped bf16 everywhere except tiny 7px stage-4
        # maps. Dense block-diagonal when the whole conv fits one lane
        # tile; plain int8 grouped at >= 14px; bf16_codes only below.
        if (u.kind == "conv" and 1 < u.groups < u.in_ch
                and site in int8_sites):
            if d.w_int_bd is not None and d.w_groups is None:
                plan[u.name] = ("int8_bd", site)
                continue
            if d.w_int is not None and min(unit_hw[u.name]) >= 14:
                plan[u.name] = ("int8", site)
                continue
        # fused VPU depthwise kernel: feed codes AND the unit's own output
        # codes must both fit centered int8 (the kernel reads/writes int8)
        if (use_dw_kernel and d.w_int is not None and u.kind == "conv"
                and u.groups == u.in_ch == u.out_ch
                and u.kernel == (3, 3) and u.padding == (1, 1)
                and u.stride[0] == u.stride[1] and u.stride[0] in (1, 2)
                and site in int8_sites and u.name in int8_sites
                and d.w_groups is None):
            plan[u.name] = ("dw_int8", site)
            continue
        if use_packed and d.w_packed is not None and site in int8_sites:
            plan[u.name] = ("packed", site)
            continue
        if d.w_int is not None and site is not None \
                and _scalar_step(act_steps[site]):
            delta, zp, n_bits = act_steps[site]
            zpv = float(np.asarray(zp).reshape(-1)[0])
            fits_int8 = ((2 ** n_bits - 1) - zpv <= 127) and (-zpv >= -128)
            fits_bf16 = (2 ** n_bits - 1) <= 256  # codes bf16-exact
            # thin units prefer exact bf16-code operands, EXCEPT dense
            # convs at small spatial dims where the int8 path measures
            # faster on v5e (thin_conv_probe.py: int8 wins the <=28px
            # MNASNet 1x1s by ~0.3-0.4 ms each, loses at >=56px);
            # depthwise stays bf16_codes at every size. SSQ_THIN_MINHW
            # sets the bf16_codes floor (0 restores the round-2 rule).
            thin_minhw = int(os.environ.get("SSQ_THIN_MINHW", "0"))
            thin_bf16 = thin and (u.groups == u.in_ch
                                  or min(unit_hw[u.name]) >= thin_minhw)
            if thin_bf16 and fits_bf16:
                kind = "bf16_codes"
            elif fits_int8:
                kind = "int8"
            elif n_bits == 8 and zpv == 0.0:
                kind = "int8_pair"
            elif fits_bf16:
                kind = "bf16_codes"
        # optional stem rewrite: 7x7/s2/p3 conv -> space-to-depth 4x4/s1.
        # Off by default: measured on v5e the input-relayout transpose costs
        # more than the improved MXU utilization saves (10.2 vs 9.0 ms/batch
        # on ResNet-18@256); revisit with a fused Pallas s2d+conv kernel.
        if (use_s2d_stem and kind == "float" and u.kind == "conv"
                and u.kernel == (7, 7) and u.stride == (2, 2)
                and u.padding == (3, 3) and u.groups == 1):
            kind = "float_s2d"
        if u.name == stem_unit and kind == "float" and site is None:
            kind = "stem_fused"
        if stem_1pass and kind == "float" and u.kind == "conv" \
                and u.in_ch <= 4:
            kind = "float_1p"
        if float_1pass and kind == "float" and d.w_int is not None:
            kind = "float_1p"
        plan[u.name] = (kind, site)
    plan["__fused_stem__"] = stem_unit
    plan["__int8_sites__"] = int8_sites
    plan["__biased_sites__"] = biased_sites
    plan["__sum_steps__"] = sum_sites
    return plan


def _scalar_step(st):
    """True when the site's (delta, zp) are scalars. Per-channel steps
    (hardened ActShiftQuant) cannot factor out of the consumer conv as an
    output-side scale — conv(x ⊙ δ_c, W) folds into the WEIGHT, not the
    output — so such sites transport f32 edges (exact) instead of codes."""
    import numpy as np
    delta, zp, _ = st
    return np.asarray(delta).size == 1 and np.asarray(zp).size == 1


def _site_fits_int8_concrete(st):
    import numpy as np
    _, zp, n_bits = st
    if not _scalar_step(st):
        return False
    zpv = float(np.asarray(zp).reshape(-1)[0])
    return ((2 ** n_bits - 1) - zpv <= 127) and (-zpv >= -128)


def _bf16_codes_cast(t):
    """int8 codes -> bf16 operand, avoiding a TPU miscompile.

    A DIRECT int8->bf16 convert feeding a grouped/depthwise
    conv_general_dilated miscompiles on the axon XLA:TPU backend: ~97% of
    outputs come back NaN (minimal repro in round4_logs/NOTES_deploy_nan.md;
    dense convs are unaffected, and the same graph is exact on XLA:CPU).
    This was the entire trained-MNV2/MNASNet deploy!=sim collapse
    (VERDICT r3 weak #2): every thin unit takes the bf16_codes plan kind,
    so the whole network ran on NaN-poisoned convs.

    The miscompile is specific to feature_group_count > 1 (probed on-chip:
    dense 3x3/1x1 convs with direct-cast int8 operands are exact, grouped
    and depthwise NaN), so DENSE consumers keep the zero-cost direct cast
    (``grouped=False``) and only grouped/depthwise consumers pay a
    workaround. Two exact workarounds for those (both NaN-free in the
    isolated repro AND at 99.9% trained-state parity end-to-end):
      'f32' (default) — route the convert through f32; costs a 4-byte
        intermediate (~4% on MNV2/MNASNet bench rows);
      'barrier' (SSQ_BF16_CAST=barrier) — direct cast behind an
        optimization_barrier; measured much slower (blocks all fusion
        around the operand: MNV2 0.65x vs 0.90x) — kept for bisection."""
    import os
    if os.environ.get("SSQ_FAULT_GROUPED_CAST") == "nan":
        # test-only fault injection: emulate the round-3 XLA:TPU
        # miscompile (NaN accumulators on grouped-conv operands,
        # round4_logs/NOTES_deploy_nan.md) deterministically on any
        # platform, so the bench parity gate's nonzero-exit behavior is
        # testable on CPU (tests/test_bench_gate.py)
        return (t.astype(jnp.float32) * jnp.nan).astype(jnp.bfloat16)
    if os.environ.get("SSQ_BF16_CAST", "f32") == "barrier":
        return jax.lax.optimization_barrier(t.astype(jnp.bfloat16))
    return t.astype(jnp.float32).astype(jnp.bfloat16)


def _bf16_operand(t, grouped: bool):
    """int8 -> bf16 conv operand: direct (zero-cost) for dense consumers,
    miscompile-safe cast for grouped/depthwise (see _bf16_codes_cast)."""
    if grouped:
        return _bf16_codes_cast(t)
    return t.astype(jnp.bfloat16)


def _round_act(x):
    """Activation-requant rounding: floor(x+0.5) (round-half-up).

    XLA:TPU fuses floor into conv epilogues, while RoundNearestEven
    breaks the fusion and costs ~+0.5 ms per MNV2 block at batch 256
    (mnv2_block_probe.py). Differs from sim's jnp.round (half-to-even)
    only on exact .5 ties — measure-zero on real-valued activation
    grids. Weight conversion (build_deploy_params) keeps jnp.round."""
    return jnp.floor(x + 0.5)


def _quant_centered(x, delta, zp, n_bits):
    q = jnp.clip(_round_act(x / delta) + zp, 0, 2 ** n_bits - 1)
    return (q - zp).astype(jnp.int8)


@dataclasses.dataclass
class _Pending:
    """A unit's un-applied dequant epilogue: value = acc * scale + bias.

    Deliberately NOT a tuple/pytree — it exists only transiently inside the
    deploy_forward trace so quantize_out can fuse the epilogue with the
    requant into one multiply-add in code space (see quantize_out)."""
    acc: jax.Array
    scale: Optional[jax.Array]
    bias: Optional[jax.Array]


def _finish_affine(acc, sc, b):
    y = acc if sc is None else acc * sc
    return y if b is None else y + b


def _int_conv(x_int8, w_int8_oihw, stride, padding, groups):
    w = jnp.transpose(w_int8_oihw, (2, 3, 1, 0))
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    return jax.lax.conv_general_dilated(
        x_int8, w, window_strides=stride, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)


# trace-time counters reset by each deploy_forward call (see docstring);
# only meaningful right after a non-cached (tracing) invocation
pair_stats = {"formed": 0, "consumed_fast": 0}


def _traced_nodes(graph, trace, snap):
    """Yield graph nodes; when ``trace`` is a list, append
    (node_name, float_value_after_node) after each node executes —
    per-node parity debugging against the sim interpreter."""
    if trace is None:
        yield from graph
        return
    for node in graph:
        yield node
        trace.append((node.name, snap()))


def deploy_forward(graph: Graph, dparams: dict, act_steps: dict, x,
                   plan: Optional[dict] = None, trace: Optional[list] = None):
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
    # trace-time introspection for tests: how many pair values formed and
    # how many consumers took the decomposed int8 fast path this trace
    pair_stats["formed"] = 0
    pair_stats["consumed_fast"] = 0
    if plan is None:
        plan = make_deploy_plan(graph, dparams, act_steps)
    # synthetic harmonized-chain grids, precomputed by make_deploy_plan:
    # act_steps values are TRACED when this runs under jit (plan is the
    # eager-context artifact), so the sum-site construction — which needs
    # concrete deltas for the equality/bound gates — must not rerun here
    act_steps = {**act_steps, **plan.get("__sum_steps__", {})}
    _int8_sites = plan["__int8_sites__"]
    _biased_sites = plan.get("__biased_sites__", frozenset())
    stem_name = plan.get("__fused_stem__")
    stem_ok = (stem_name is not None and x.ndim == 4
               and x.shape[1] == x.shape[2] and x.shape[1] % 8 == 0)
    # Pallas TPU kernels run in interpret mode on other backends (CPU
    # tests); the plan itself is platform-independent.
    interp = jax.default_backend() != "tpu"
    # n-term code transport across siteless residual blocks (MNASNet).
    # Default OFF on TPU: the first mnasnet deploy graph containing the
    # decomposed pair convs wedged the remote XLA:TPU compile service for
    # >1h (2026-08-18; every prior mnasnet deploy graph compiled in
    # minutes). CPU (incl. the test suite) keeps it on — parity is
    # proven there. SSQ_PAIR_TRANSPORT=1/0 overrides either way.
    import os
    _use_pairs = os.environ.get(
        "SSQ_PAIR_TRANSPORT",
        "0" if jax.default_backend() == "tpu" else "1") != "0"
    # term cap for the deferred code sums. Default 2 (one projection + one
    # code residual): deeper chains materialize f32, bounding both the
    # cross-block liveness of code tensors and the per-consumer conv count
    # — the two prime suspects for the XLA:TPU compile wedge (NEXT.md #1),
    # and >2 int8 terms cost more MXU than the 2-pass split they replace.
    _env_terms = int(os.environ.get("SSQ_PAIR_TERMS", "2"))
    # values <2 disable pair formation entirely (an alias for
    # SSQ_PAIR_TRANSPORT=0, handy for compile-wedge bisection); the
    # decomposition itself needs >=2 terms (projection + one residual)
    _use_pairs = _use_pairs and _env_terms >= 2
    _pair_terms = max(2, _env_terms)

    def to_float(v):
        kind, t, site = v
        if kind == "f32":
            return t
        if kind == "pair":      # n-term code sum (siteless residual chain)
            acc = to_float(t[0])
            for term in t[1:]:
                acc = acc + to_float(term)
            return acc
        delta, zp, _ = act_steps[site]
        if kind == "biased":
            return (t.astype(jnp.float32) + 128.0) * delta
        return t.astype(jnp.float32) * delta

    def materialize(val, act=None):
        """Apply a pending epilogue + activation to a raw float value."""
        if isinstance(val, tuple):
            return _activation(act, to_float(val))
        if isinstance(val, _Pending):
            return _activation(act, _finish_affine(val.acc, val.scale,
                                                   val.bias))
        return _activation(act, val)

    def quantize_out(val, site, act=None, residual=None):
        """Producer-side epilogue + quantization onto the site grid.

        Two exact folds, both isolated on mnv2_block_probe.py:

        - clamp activations (relu/relu6) fold into the requant clip
          bounds: code(t) = floor(t/delta + 0.5) + zp is nondecreasing,
          so code(clip(x, 0, 6)) == clip(code(x), code(0), code(6)) — a
          separate relu6 pass costs ~0.15 ms/block at features.2 shapes
          (XLA does not collapse clamp-of-clamp across the requant mul);
        - the unit's dequant epilogue (acc*scale + bias) and the requant
          (/delta, +zp) fuse into ONE multiply-add in code space:
          q = clip(floor(acc*M + C), lo, hi) with M = scale/delta and
          C = bias/delta + 0.5 + zp (integer zp commutes with floor) —
          measured -0.2 ms/block vs the two-step form ("epi folded
          single-FMA" probe row; a bare reciprocal swap saves nothing).

        A block residual add fuses into the same chain (``residual=``):
        floor(acc*M + r*Mr + C) where r is the residual's raw codes and
        Mr its step over this site's step — no f32 residual tensor is
        ever materialized ("code-space residual" probe row reached bf16
        parity at features.3 shapes).

        Multiplier association differs from the two-step float math by
        ~1 ulp: 6e-8 of codes flip on a dense grid — same accepted class
        as the floor(x+0.5) rounding (BENCHMARKS.md)."""
        if isinstance(val, tuple) and residual is None \
                and val[2] == site:
            return val          # fused kernel already on this site's grid
        st = act_steps.get(site)
        if st is None:
            y = materialize(val)
            if residual is not None:
                y = y + to_float(residual)
            return ("f32", _activation(act, y), None)
        delta, zp, n_bits = st
        inv = 1.0 / delta
        # assemble the floor argument as one fused chain: acc*M [+ r*Mr] + C
        if isinstance(val, _Pending):
            acc = val.acc
            M = inv if val.scale is None else val.scale * inv
            C = 0.5 + (0.0 if val.bias is None else val.bias * inv)
        elif isinstance(val, tuple):
            kind_v, tv, site_v = val
            if kind_v == "f32":
                acc, M, C = tv, inv, 0.5
            else:   # codes/biased on another site's grid
                acc = tv.astype(jnp.float32)
                M, C = act_steps[site_v][0] * inv, 0.5
                if kind_v == "biased":
                    C = C + 128.0 * M
        else:
            acc, M, C = val, inv, 0.5
        r, Mr = None, None
        if residual is not None:
            kind_r, tr, site_r = residual
            if kind_r in ("f32", "pair"):
                r, Mr = to_float(residual), inv
            else:
                r = tr.astype(jnp.float32)
                Mr = act_steps[site_r][0] * inv
                if kind_r == "biased":
                    C = C + 128.0 * Mr

        def codes_of(zp0, lo, hi):
            a = act
            if a in ("relu", "relu6"):
                lo = jnp.maximum(lo, zp0 + 0.0)           # code(0) == zp
                if a == "relu6":
                    hi = jnp.minimum(hi, jnp.floor(6.0 * inv + 0.5) + zp0)
                a = None
            arg = acc * M + (C + zp0) if r is None \
                else acc * M + r * Mr + (C + zp0)
            if a is not None:   # non-clamp activation: materialize first
                y = _activation(a, (arg - (0.5 + zp0)) * delta)
                return jnp.clip(jnp.floor(y * inv + 0.5) + zp0, lo, hi)
            return jnp.clip(jnp.floor(arg), lo, hi)

        if site in _int8_sites:
            q = codes_of(zp, 0.0, 2.0 ** n_bits - 1)
            return ("codes", (q - zp).astype(jnp.int8), site)
        if site in _biased_sites:
            q = codes_of(0.0, 0.0, 255.0)        # biased sites have zp == 0
            return ("biased", (q - 128).astype(jnp.int8), site)
        q = codes_of(zp, 0.0, 2.0 ** n_bits - 1)
        return ("f32", (q - zp) * delta, None)

    def _int_acc(spec, xi, w_int):
        if spec.kind == "conv":
            return _int_conv(xi, w_int, spec.stride, spec.padding,
                             spec.groups)
        return jax.lax.dot_general(xi, w_int.T, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def run_unit(spec: UnitSpec, v):
        d = dparams[spec.name]
        kind_plan, feed_site = plan[spec.name]
        vkind, t, vsite = v
        if kind_plan == "stem_fused" and not stem_ok:
            kind_plan = "float"       # kernel needs square, 8-aligned input
        if kind_plan == "stem_fused":
            xf = to_float(v)
            # one-kernel conv+relu+quant+maxpool (ops/pallas/stem.py); the
            # following maxpool OpSpec is skipped by the walk below
            from .ops.pallas.stem import stem_fused
            delta, zp, n_bits = act_steps[spec.name]
            # zp may be traced (deploy_forward under jit): keep it an array
            zpv = jnp.reshape(jnp.asarray(zp, jnp.float32), (-1,))[0]
            biased = spec.name in _biased_sites
            coff = jnp.float32(128.0) if biased else zpv
            w_eff = d.w_int if d.w_int is not None else d.w_fp
            codes = stem_fused(xf, w_eff.astype(jnp.float32), d.scale,
                               d.bias, delta, zpv, 2.0 ** n_bits - 1, coff,
                               interpret=interp)
            return ("biased" if biased else "codes", codes, spec.name)
        if kind_plan == "dw_int8":
            # fused VPU depthwise conv + requant (ops/pallas/depthwise.py)
            from .ops.pallas.depthwise import dw_conv3x3_int8
            delta, zp, n_bits = act_steps[feed_site]
            if vkind == "codes":
                xi = t
            else:
                xi = _quant_centered(to_float(v), delta, zp, n_bits)
            delta_o, zp_o, n_bits_o = act_steps[spec.name]
            zov = jnp.reshape(jnp.asarray(zp_o, jnp.float32), (-1,))[0]
            out = dw_conv3x3_int8(
                xi, d.w_int.reshape(spec.out_ch, 3, 3),
                d.scale * delta, d.bias, delta_o, zov,
                2.0 ** n_bits_o - 1, stride=spec.stride[0],
                act=spec.activation or "none", interpret=interp)
            return ("codes", out, spec.name)
        if kind_plan == "packed":
            # sub-byte packed weights (4x/2x less weight HBM): Pallas
            # unpack-in-VMEM matmul (ops/pallas/packed.py). 1x1 convs
            # flatten to (B*H*W, C) rows; stride subsamples rows first
            # (padding == 0, so a strided 1x1 conv reads exactly the
            # strided grid). Activation is folded downstream by
            # quantize_out.
            from .ops.pallas.packed import packed_quant_matmul
            delta, zp, n_bits = act_steps[feed_site]
            zpv = jnp.reshape(jnp.asarray(zp, jnp.float32), (-1,))[0]
            dv = jnp.reshape(jnp.asarray(delta, jnp.float32), (-1,))[0]
            if vkind == "codes":
                # codes are already on the grid: identity re-quant inside
                # the kernel (delta=1) and fold the true step into the
                # epilogue scale
                xq = t.astype(jnp.float32)
                d_in, sc = jnp.float32(1.0), d.scale * dv
            else:
                xq, d_in, sc = to_float(v), dv, d.scale
            if spec.kind == "conv" and spec.stride != (1, 1):
                xq = xq[:, ::spec.stride[0], ::spec.stride[1], :]
            lead = xq.shape[:-1]
            out = packed_quant_matmul(
                xq.reshape(-1, xq.shape[-1]), d.w_packed, d.w_pack_zp,
                sc, d.bias, d_in, zpv, d.w_pack_bits, n_bits,
                interpret=interp)
            return out.reshape(*lead, -1)
        if kind_plan in ("int8", "int8_bd", "int8_pair", "bf16_codes"):
            delta, zp, n_bits = act_steps[feed_site]
            if kind_plan == "bf16_codes":
                # centered codes as exact bf16 operands, f32 accumulate
                if vkind == "codes":
                    xc = _bf16_operand(t, spec.groups > 1)
                elif vkind == "biased":
                    # biased sites have zp==0, so centered == raw q = t+128
                    xc = (t.astype(jnp.float32) + 128.0).astype(jnp.bfloat16)
                else:
                    q = jnp.clip(_round_act(t / delta) + zp,
                                 0, 2 ** n_bits - 1) - zp
                    xc = q.astype(jnp.bfloat16)

                def acc_fn(wg):
                    wb = _bf16_operand(wg, spec.groups > 1)
                    if spec.kind == "conv":
                        wt = jnp.transpose(wb, (2, 3, 1, 0))
                        pad = ((spec.padding[0], spec.padding[0]),
                               (spec.padding[1], spec.padding[1]))
                        return jax.lax.conv_general_dilated(
                            xc, wt, window_strides=spec.stride, padding=pad,
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            feature_group_count=spec.groups,
                            preferred_element_type=jnp.float32)
                    return jax.lax.dot_general(
                        xc, wb.T, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            elif kind_plan in ("int8", "int8_bd"):
                xi = t if vkind == "codes" \
                    else _quant_centered(t, delta, zp, n_bits)
                if kind_plan == "int8_bd":
                    # dense block-diagonal codes (exact: zeros contribute 0)
                    acc_fn = lambda wg: _int_conv(
                        xi, d.w_int_bd, spec.stride, spec.padding, 1)
                else:
                    acc_fn = lambda wg: _int_acc(spec, xi, wg)
            else:
                # 8-bit unsigned codes (zp==0): q = 16*hi + lo, both
                # nibbles in [0,16) -> two exact int8 convs
                if vkind == "biased":
                    q = t.astype(jnp.int32) + 128
                else:
                    q = jnp.clip(_round_act(to_float(v) / delta), 0,
                                 255).astype(jnp.int32)
                hi = (q >> 4).astype(jnp.int8)
                lo = (q & 15).astype(jnp.int8)
                acc_fn = lambda wg: (16 * _int_acc(spec, hi, wg)
                                     + _int_acc(spec, lo, wg))
            if d.w_groups is not None:
                # per-(oc, ic-group) scale-table epilogue: one int conv per
                # shift candidate, each dequantized at its own per-OC scale
                out = jnp.float32(0.0)
                for s in range(d.w_groups.shape[0]):
                    out = out + acc_fn(d.w_groups[s]).astype(jnp.float32) \
                        * (d.group_scales[s] * delta)
                return _Pending(out, None, d.bias)
            return _Pending(acc_fn(d.w_int).astype(jnp.float32),
                            d.scale * delta, d.bias)
        else:
            # pair-fed consumer (two code grids summed by a siteless
            # residual block): conv is linear, so conv(q1*d1 + q2*d2, W)
            # == conv(q1, W)*d1 + conv(q2, W)*d2 — two exact code convs
            # replace BOTH the 2-pass hi/lo float split and the f32
            # materialization of the sum (MNASNet stage tails)
            if vkind == "pair" and kind_plan == "float" \
                    and d.w_int is not None and d.w_groups is None:
                # (w_groups units skip this: their codes need the per-
                # candidate scale table; they take the fallthrough below,
                # which folds the table back into the weight)
                # each term's codes are int8 by construction, so run one
                # int8 MXU conv per term (int8 ~1.4x bf16 per op on v5e —
                # BENCHMARKS.md isolated ops): 2 int8 terms cost ~0.7 of
                # the 2-pass hi/lo bf16 split they replace, and the sum is
                # exact (conv is linear over q1*d1 + q2*d2)
                pair_stats["consumed_fast"] += 1
                acc = None
                for _, tc, sc_site in t:
                    term = _int_acc(spec, tc, d.w_int).astype(jnp.float32) \
                        * act_steps[sc_site][0]
                    acc = term if acc is None else acc + term
                return _Pending(acc, d.scale, d.bias)
            xf = to_float(v)
            # Weights are integer codes (int8 or f32): EXACTLY
            # bf16-representable (|centered| <= 255 < 2^8 mantissa), so the
            # weight's bf16 low part is zero and Precision.HIGH's 3-pass
            # split (x_hi*w_hi + x_hi*w_lo + x_lo*w_hi) wastes a full pass
            # on w_lo == 0. Manual 2-pass: x = x_hi + x_lo with only the
            # ACTIVATION split — numerically identical to HIGH for exact-
            # bf16 weights (~2^-18 relative) at 2/3 the MXU cost. The stem
            # conv (3-ch, the single biggest deficit on ResNet-18 —
            # BENCHMARKS.md per-segment table) runs here.
            w_eff = (d.w_int if d.w_int is not None else d.w_fp
                     ).astype(jnp.float32)
            if d.w_groups is not None:
                # baked shift-table unit on a float edge: fold the per-
                # candidate scale table back into the weight
                # (group_scales/scale == the shift target per candidate);
                # same ~2^-9 bf16 weight rounding the cmax>127 baked
                # branch accepts — plain w_int here would drop the shifts
                ratio = (d.group_scales / d.scale[None, :]).reshape(
                    (d.w_groups.shape[0], -1) + (1,) * (w_eff.ndim - 1))
                w_eff = jnp.sum(d.w_groups.astype(jnp.float32) * ratio,
                                axis=0)
            sc = d.scale
            if kind_plan == "float_s2d":
                xf = space_to_depth(xf)
                w_eff = s2d_kernel(w_eff)

            x_hi = xf.astype(jnp.bfloat16)
            x_lo = (xf - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            w_b = w_eff.astype(jnp.bfloat16)

            def _pass(xb):
                if kind_plan == "float_s2d":
                    return jax.lax.conv_general_dilated(
                        xb, jnp.transpose(w_b, (2, 3, 1, 0)),
                        window_strides=(1, 1), padding=((2, 1), (2, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)
                if spec.kind == "conv":
                    return conv2d(xb, w_b, None, spec.stride, spec.padding,
                                  spec.groups,
                                  preferred_element_type=jnp.float32)
                return jax.lax.dot_general(
                    xb, w_b.T, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            if kind_plan == "float_1p":
                # stem fast mode: integer-code weights are bf16-exact, so
                # the single bf16 pass only rounds the activation (~2^-9
                # rel); measured logit drift is recorded in BENCHMARKS.md
                out = _pass(x_hi)
            else:
                out = _pass(x_hi) + _pass(x_lo)
            # activation is intentionally NOT applied in run_unit:
            # quantize_out applies the pending epilogue fused with the
            # requant and folds relu/relu6 into the clip (exact), or
            # materialize() finishes it when the output has no quant site
            return _Pending(out, sc, d.bias)

    v = ("f32", x, None)
    pooled_by_stem = False
    for node in _traced_nodes(graph, trace, lambda: to_float(v)):
        if isinstance(node, OpSpec):
            if v[0] == "pair":         # ops consume a plain tensor
                v = ("f32", to_float(v), None)
            kind, t, site = v
            if node.op == "maxpool" and pooled_by_stem:
                pooled_by_stem = False   # stem kernel already pooled
            elif node.op == "maxpool":
                # monotonic: pool codes directly (int8) or floats
                if kind in ("codes", "biased"):
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
            v = quantize_out(run_unit(node, v), node.name, node.activation)
            if node.name == stem_name and stem_ok:
                pooled_by_stem = True
        else:  # BlockSpec
            res_v = None
            if node.residual:
                # identity residuals stay in their code form and fuse into
                # the block-site requant chain (quantize_out residual=);
                # downsample residuals materialize their pending epilogue
                res_v = ("f32", materialize(
                    run_unit(node.downsample, v),
                    node.downsample.activation), None) \
                    if node.downsample is not None else v
            t = v
            for u in node.units:
                t = quantize_out(run_unit(u, t), u.name, u.activation)
                if trace is not None:
                    trace.append((u.name, to_float(t)))
            no_site = act_steps.get(node.name) is None
            sum_site = f"{node.name}__sum__"
            if (node.post_activation is None and no_site
                    and sum_site in act_steps
                    and isinstance(t, tuple) and t[0] == "codes"
                    and res_v is not None and res_v[0] == "codes"):
                # harmonized chain (equal-delta grids): the residual add is
                # an EXACT int8 code add — one tensor, no f32 edge, and the
                # consumer runs a single int8 conv (_chain_sum_sites)
                v = ("codes", t[1] + res_v[1], sum_site)
            elif res_v is None and node.post_activation is None and no_site:
                # siteless pass-through: the block output IS the last
                # unit's tensor — keep its code form (matches
                # _feeding_sites)
                v = t
            elif (node.post_activation is None and no_site
                    and _use_pairs
                    and isinstance(t, tuple) and t[0] == "codes"
                    and isinstance(res_v, tuple)
                    and res_v[0] in ("codes", "pair")
                    and (res_v[0] == "codes"
                         or len(res_v[1]) < _pair_terms)):
                # siteless residual of code grids: defer the sum to the
                # consumer, which decomposes conv(sum q_i*d_i) into one
                # exact int8 code conv per term (capped at SSQ_PAIR_TERMS;
                # deeper chains materialize f32 below)
                terms = (res_v,) if res_v[0] == "codes" else res_v[1]
                pair_stats["formed"] += 1
                v = ("pair", (t,) + tuple(terms), None)
            else:
                v = quantize_out(t, node.name, node.post_activation,
                                 residual=res_v)
    return to_float(v)
