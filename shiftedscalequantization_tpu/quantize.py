"""Quantized-model construction and state management.

Functional equivalent of the reference's QuantModel construction pipeline
(quant/quant_model.py:8-13: BN-fold then wrap every conv/linear) and its
global state toggles: build folded params once, derive an explicit qstate
pytree, and express "quant on/off" as Flags values instead of mutating
module attributes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import fold_bn as fb
from .graph import BlockSpec, Flags, Graph, UnitQuant, UnitSpec, forward, \
    init_act_quant, iter_units
from .ops import quant as Q
from .ops import wquant as W


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Quantization hyperparameters (mirrors the reference CLI flags,
    common.py:33-71)."""
    n_bits_w: int = 2
    n_bits_a: int = 4
    channel_wise: bool = True
    sym: bool = False
    w_scale_method: str = "mse"      # 'mse' | 'max'
    a_scale_method: str = "mse"
    use_8bit_head_stem: bool = True  # reference --disable_8bit_head_stem=False


def build_qstate(graph: Graph, folded_params: dict, cfg: QuantConfig) -> dict:
    """Initialize per-unit weight quantizers from the folded weights.

    Replaces the reference's lazy init-on-first-forward for weights
    (quant_layer.py:77-89): weight scale init depends only on the weight
    tensor, so it happens eagerly here. Per-channel init is the vmapped MSE
    grid (ops/quant.py) instead of the per-channel Python loop
    (quant_layer.py:113-114). Applies the 8-bit head/stem rule
    (quant_model.py:59-69) when cfg.use_8bit_head_stem.
    """
    units = list(iter_units(graph))
    order = unit_order(graph)
    wbit_override, _ = _head_stem_overrides(order, cfg)
    qstate = {}
    for u in units:
        w = folded_params[u.name]["w"]
        n_bits = wbit_override.get(u.name, cfg.n_bits_w)
        qp, raw_zp = W_init(w, n_bits, cfg)
        oc = u.out_ch
        qstate[u.name] = UnitQuant(
            wq=W.UniformWQ(qp=qp), aq=None,
            alpha_out=jnp.ones((oc,), w.dtype),
            beta_out=jnp.zeros((oc,), w.dtype),
            raw_zp=raw_zp)
    return qstate


def W_init(w, n_bits, cfg: QuantConfig):
    flat = w.reshape(w.shape[0], -1)
    qp, raw_zp = Q.init_weight_qparams(
        flat, n_bits=n_bits, sym=cfg.sym, channel_wise=cfg.channel_wise,
        scale_method=cfg.w_scale_method)
    return qp, raw_zp


def unit_order(graph: Graph):
    """Units in the reference's module-registration order (the order
    QuantModel.set_first_last_layer_to_8bit indexes, quant_model.py:59-69)."""
    return [u.name for u in iter_units(graph)]


def _head_stem_overrides(order, cfg: QuantConfig):
    """(weight-bit overrides, act-bit overrides) for 8-bit head/stem."""
    if not cfg.use_8bit_head_stem or len(order) < 2:
        return {}, {}
    wbits = {order[0]: 8, order[-1]: 8}
    abits = {order[0]: 8, order[-2]: 8}
    return wbits, abits


def reconstruction_targets(graph: Graph, block_level: bool = True):
    """Nodes to reconstruct, in order; the first unit is skipped when 8-bit
    head/stem marks it ignore_reconstruction (quant_model.py:68-69)."""
    order = unit_order(graph)
    first = order[0]
    targets = []
    for node in graph:
        if isinstance(node, UnitSpec):
            if node.name != first:
                targets.append(node.name)
        elif isinstance(node, BlockSpec):
            if block_level and node.block_act_quant:
                targets.append(node.name)
            else:
                # per-unit recon (also for non-`specials` residual structures
                # like MNASNet, quant_block.py:242-248)
                targets.extend(u.name for u in node.units)
                if node.downsample is not None:
                    targets.append(node.downsample.name)
    return targets


def act_quant_sites(graph: Graph, cfg: QuantConfig,
                    disable_output_quant: bool = True):
    """name -> n_bits for every act-quant site (units with act quant enabled
    + block outputs), honoring 8-bit head/stem and the reference's
    disable_network_output_quantization (quant_model.py:71-76)."""
    order = unit_order(graph)
    _, abit_override = _head_stem_overrides(order, cfg)
    sites = {}
    for node in graph:
        if isinstance(node, UnitSpec):
            if not node.disable_act_quant:
                sites[node.name] = abit_override.get(node.name, cfg.n_bits_a)
        elif isinstance(node, BlockSpec):
            for u in node.units:
                if not u.disable_act_quant:
                    sites[u.name] = abit_override.get(u.name, cfg.n_bits_a)
            if node.block_act_quant:
                sites[node.name] = cfg.n_bits_a
    if disable_output_quant and order[-1] in sites:
        del sites[order[-1]]
    return sites


def act_flags(graph: Graph, cfg: QuantConfig, base: Optional[Flags] = None,
              disable_output_quant: bool = True) -> Flags:
    """Flags with act quant enabled exactly at the calibrated sites
    (i.e. honoring disable_network_output_quantization, the reference
    quant_model.py:71-76). Use this instead of Flags.all_acts when the
    output-layer act quantizer was never calibrated."""
    sites = act_quant_sites(graph, cfg, disable_output_quant)
    base = base or Flags()
    return dataclasses.replace(base, act_on=frozenset(sites))


def calibrate_acts(graph: Graph, params, qstate, cali_batch, cfg: QuantConfig,
                   flags: Optional[Flags] = None,
                   disable_output_quant: bool = True,
                   bit_overrides: Optional[dict] = None):
    """Initialize all activation quantizers in one traced pass over
    ``cali_batch`` (typically cali_data[:64]) and return a new qstate with
    aq set. ``flags`` controls which weight quantizers are live during
    calibration (reference: set_quant_state(True, False) then forward).

    ``bit_overrides``: {site name: n_bits} — per-site act-precision
    overrides (mixed-precision activations). The reference's 8-bit
    head/stem rule (quant_model.py:59-69) generalized to ANY site: a
    deep net at A4 is often bottlenecked by one or two dominant act
    sites (measured: ResNet-50 W2A4's model.layer3.5 block site alone
    costs 22 top-1 points — ACCURACY_r50_r5.md), and lifting just those
    to 8 bit recovers most of the gap at negligible serving cost (the
    deploy path already handles 8-bit-fed consumers via nibble-split
    convs). Unknown site names raise KeyError."""
    if flags is None:
        flags = Flags().all_weights(graph)
    sites = act_quant_sites(graph, cfg, disable_output_quant)
    if bit_overrides:
        for name, bits in bit_overrides.items():
            if name not in sites:
                raise KeyError(
                    f"act bit override for unknown/siteless act site "
                    f"{name!r}; known sites: {sorted(sites)}")
            sites[name] = int(bits)
    new_aq = jax.jit(
        lambda p, qs, x: init_act_quant(
            graph, p, qs, x, flags, sites, act_sym=False,
            scale_method=cfg.a_scale_method),
        static_argnames=())(params, qstate, cali_batch)
    qstate = dict(qstate)
    for name, qp in new_aq.items():
        if name in qstate and isinstance(qstate[name], UnitQuant):
            qstate[name] = dataclasses.replace(qstate[name], aq=qp)
        else:
            qstate[name] = qp
    return qstate


def prepare_model(graph: Graph, raw_params: dict, cfg: QuantConfig):
    """BN-fold + weight quantizer init: the QuantModel constructor path
    (quant_model.py:8-13) as a pure function. Returns (folded_params, qstate)."""
    folded = fb.fold_bn(raw_params)
    qstate = build_qstate(graph, folded, cfg)
    return folded, qstate


def harmonize_residual_chains(graph: Graph, qstate):
    """Share one act step across every siteless residual chain.

    Non-special blocks (the reference quantizes MNASNet per-unit with no
    block act quantizer, quant_block.py:242-248 + mnasnet falling through
    quant_model.py:15-44) leave residual adds unquantized: out = proj(x)
    + x with each operand on its own unit act grid and the sum carried
    exact. For integer serving that forces an f32 edge (2-pass bf16
    split or per-term conv decomposition) at every chain consumer
    (deploy.py siteless transport). The standard production int8
    treatment is to give all operand grids the SAME step so the add is
    exact in code space; this pass rewrites each chain's member act
    quantizers to the chain-max delta, rescaling zero_point to keep the
    covered range anchored. Sim picks the new steps up transparently —
    sim == deploy stays bit-exact; the cost is grid coarsening by each
    member's (d_max / d_member) ratio, returned for reporting.

    Returns (new_qstate, {site: coarsening_ratio}) — ratios of exactly
    1.0 mean the site already had the chain-max step."""
    import numpy as np

    from .graph import BlockSpec, OpSpec, UnitSpec

    def scalar_aq(name):
        uq = qstate.get(name)
        if not isinstance(uq, UnitQuant) or uq.aq is None:
            return None
        aq = uq.aq
        if not hasattr(aq, "delta"):       # ActShiftQuant: per-channel
            return None
        if np.asarray(aq.delta).size != 1:
            return None
        return aq

    # union-find over site names
    parent = {}

    def find(a):
        parent.setdefault(a, a)
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        parent[find(a)] = find(b)

    current = None          # site name of the tensor flowing forward
    for node in graph:
        if isinstance(node, OpSpec):
            if node.op in ("gap", "avgpool", "flatten"):
                current = None
            continue
        if isinstance(node, UnitSpec):
            current = node.name if scalar_aq(node.name) else None
            continue
        entry = current
        last = node.units[-1].name
        block_site = qstate.get(node.name) is not None
        if (node.residual and node.downsample is None
                and node.post_activation is None and not block_site
                and entry is not None and scalar_aq(last) is not None):
            union(entry, last)
            current = last      # chain representative flows on
        elif not node.residual and node.post_activation is None \
                and not block_site:
            current = last if scalar_aq(last) is not None else None
        else:
            current = node.name if block_site else None

    groups = {}
    for name in parent:
        groups.setdefault(find(name), []).append(name)

    qstate = dict(qstate)
    ratios = {}
    for members in groups.values():
        if len(members) < 2:
            continue
        d_max = max(float(np.asarray(qstate[m].aq.delta)) for m in members)
        for m in members:
            aq = qstate[m].aq
            d_old = float(np.asarray(aq.delta))
            ratios[m] = d_max / d_old
            zp_new = jnp.round(aq.zero_point * (d_old / d_max))
            qstate[m] = dataclasses.replace(
                qstate[m], aq=dataclasses.replace(
                    aq, delta=jnp.full_like(aq.delta, d_max),
                    zero_point=zp_new))
    return qstate, ratios
