"""Functional ResNet family (ImageNet + CIFAR variants) as explicit graphs.

Mirrors the reference's torchvision-derived ResNets (models/resnet.py:22-298,
with the split named relu1/relu2/relu3 that the quant wrapper re-binds) and
the CIFAR-10 variant from pretrained/PyTorch_CIFAR10 (3x3 stride-1 stem, no
maxpool; referenced at quant/quant_block.py:11). Instead of module rebinding,
the fused activations and block structure are encoded directly in the graph:
QuantBasicBlock / QuantBottleneck wiring (quant/quant_block.py:76-166) —
conv-N of each block has disable_act_quant=True, the post-add ReLU and the
block-level act quantizer belong to the BlockSpec.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..graph import BlockSpec, OpSpec, UnitSpec


def _conv(name, cin, cout, k, s, p, act=None, disable_aq=False, groups=1):
    return UnitSpec(name=name, kind="conv", in_ch=cin, out_ch=cout,
                    kernel=(k, k), stride=(s, s), padding=(p, p),
                    groups=groups, activation=act,
                    disable_act_quant=disable_aq, has_bn=True)


def _basic_block(name, cin, cout, stride):
    """BasicBlock (ResNet-18/34): conv1(3x3,relu) -> conv2(3x3) -> +res -> relu.

    conv2 and downsample have disable_act_quant=True (reference
    quant_block.py:84,92-93); the post-add activation + block act quantizer
    live on the BlockSpec."""
    units = (
        _conv(f"{name}.conv1", cin, cout, 3, stride, 1, act="relu"),
        _conv(f"{name}.conv2", cout, cout, 3, 1, 1, disable_aq=True),
    )
    down = None
    if stride != 1 or cin != cout:
        down = _conv(f"{name}.downsample.0", cin, cout, 1, stride, 0,
                     disable_aq=True)
    return BlockSpec(name=name, units=units, downsample=down,
                     residual=True, post_activation="relu")


def _bottleneck(name, cin, width, cout, stride):
    """Bottleneck (ResNet-50/101/152), reference quant_block.py:133-166."""
    units = (
        _conv(f"{name}.conv1", cin, width, 1, 1, 0, act="relu"),
        _conv(f"{name}.conv2", width, width, 3, stride, 1, act="relu"),
        _conv(f"{name}.conv3", width, cout, 1, 1, 0, disable_aq=True),
    )
    down = None
    if stride != 1 or cin != cout:
        down = _conv(f"{name}.downsample.0", cin, cout, 1, stride, 0,
                     disable_aq=True)
    return BlockSpec(name=name, units=units, downsample=down,
                     residual=True, post_activation="relu")


def build_resnet(depth: int = 18, num_classes: int = 1000,
                 variant: str = "imagenet"):
    """Build (graph, meta). variant: 'imagenet' | 'cifar'."""
    cfgs = {18: ("basic", (2, 2, 2, 2)), 34: ("basic", (3, 4, 6, 3)),
            50: ("bottleneck", (3, 4, 6, 3)), 101: ("bottleneck", (3, 4, 23, 3)),
            152: ("bottleneck", (3, 8, 36, 3))}
    kind, layers = cfgs[depth]
    expansion = 1 if kind == "basic" else 4
    nodes = []
    if variant == "imagenet":
        nodes.append(_conv("model.conv1", 3, 64, 7, 2, 3, act="relu"))
        nodes.append(OpSpec("model.maxpool", "maxpool",
                            window=(3, 3), stride=(2, 2), padding=(1, 1)))
    else:  # CIFAR stem: 3x3 stride 1, no maxpool
        nodes.append(_conv("model.conv1", 3, 64, 3, 1, 1, act="relu"))
    cin = 64
    for stage, n_blocks in enumerate(layers):
        planes = 64 * (2 ** stage)
        cout = planes * expansion
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            name = f"model.layer{stage + 1}.{b}"
            if kind == "basic":
                nodes.append(_basic_block(name, cin, cout, stride))
            else:
                nodes.append(_bottleneck(name, cin, planes, cout, stride))
            cin = cout
    nodes.append(OpSpec("model.avgpool", "gap"))
    nodes.append(UnitSpec(name="model.fc", kind="linear", in_ch=cin,
                          out_ch=num_classes))
    return tuple(nodes)


# ---------------------------------------------------------------------------
# Parameter init / torch import keys
# ---------------------------------------------------------------------------

def init_unit_params(key, spec: UnitSpec, dtype=jnp.float32):
    """He-normal conv/linear init + identity BN stats (random baseline)."""
    kw, kb = jax.random.split(key)
    if spec.kind == "conv":
        shape = (spec.out_ch, spec.in_ch // spec.groups, *spec.kernel)
        fan_in = shape[1] * shape[2] * shape[3]
    else:
        shape = (spec.out_ch, spec.in_ch)
        fan_in = spec.in_ch
    w = jax.random.normal(kw, shape, dtype) * math.sqrt(2.0 / fan_in)
    p = {"w": w}
    if spec.has_bn:
        c = spec.out_ch
        p["bn"] = {"gamma": jnp.ones(c, dtype), "beta": jnp.zeros(c, dtype),
                   "mean": jnp.zeros(c, dtype), "var": jnp.ones(c, dtype)}
    else:
        p["b"] = jnp.zeros(spec.out_ch, dtype)
    return p


def init_params(key, graph, dtype=jnp.float32):
    from ..graph import iter_units
    units = list(iter_units(graph))
    keys = jax.random.split(key, len(units))
    return {u.name: init_unit_params(k, u, dtype) for u, k in zip(units, keys)}


def torch_key_map(graph):
    """unit name -> (conv_prefix, bn_prefix | None) in a torchvision-style
    state dict. Our unit names mirror the torch module paths (minus 'model.'),
    with BN names derived per family convention (convN <-> bnN; stem
    conv1 <-> bn1; downsample.0 <-> downsample.1)."""
    from ..graph import iter_units
    m = {}
    for u in iter_units(graph):
        tname = u.name.removeprefix("model.")
        if not u.has_bn:
            m[u.name] = (tname, None)
        elif tname == "conv1":
            m[u.name] = (tname, "bn1")
        elif tname.endswith("downsample.0"):
            m[u.name] = (tname, tname[:-1] + "1")
        else:
            head, leaf = tname.rsplit(".", 1)
            m[u.name] = (tname, f"{head}.bn{leaf[-1]}")
    return m
