"""Model-zoo graph construction + forward shape checks + torch import."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu import fold_bn
from shiftedscalequantization_tpu.graph import BlockSpec, iter_units
from shiftedscalequantization_tpu.models import mnasnet, mobilenetv2, regnet, \
    resnet, zoo
from shiftedscalequantization_tpu.utils import torch_import


@pytest.mark.parametrize("arch,blocks", [
    ("resnet18", 8), ("resnet50", 16), ("mobilenetv2", 17),
    ("regnetx_600m", 16), ("regnetx_3200m", 25), ("mnasnet", 16),
])
def test_graph_structure(arch, blocks):
    graph, keymap_fn = zoo.build(arch, dataset="imagenet")
    n_blocks = sum(1 for n in graph if isinstance(n, BlockSpec))
    assert n_blocks == blocks
    # channel chain is consistent
    units = list(iter_units(graph))
    assert units[0].in_ch == 3
    assert units[-1].kind == "linear" and units[-1].out_ch == 1000
    # every unit has a torch key
    km = keymap_fn(graph)
    assert set(km.keys()) == {u.name for u in units}


def test_mobilenetv2_cifar_variant():
    """32px variant: same block topology, stem + first two downsamples at
    stride 1 (feature map must not collapse below 4x4 before the GAP)."""
    graph, _ = zoo.build("mobilenetv2", dataset="synth10")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=8, w_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    last_conv = [u.name for u in iter_units(graph) if u.kind == "conv"][-1]
    cap_in, _ = ssq.forward(graph, params, qstate, x, ssq.Flags(),
                            capture=last_conv)
    assert cap_in.shape[1] >= 4, cap_in.shape
    out = ssq.forward(graph, params, qstate, x, ssq.Flags())
    assert out.shape == (2, 10) and bool(jnp.isfinite(out).all())
    # block count matches the imagenet topology (only strides change)
    n_blocks = sum(1 for n in graph if isinstance(n, BlockSpec))
    assert n_blocks == 17


@pytest.mark.parametrize("arch,hw", [("mobilenetv2", 64), ("mnasnet", 64),
                                     ("regnetx_600m", 64)])
def test_forward_shapes(arch, hw):
    graph, _ = zoo.build(arch, dataset="imagenet")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    params = fold_bn.fold_bn(raw)
    cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=8, w_scale_method="max")
    qstate = ssq.quantize.build_qstate(graph, params, cfg)
    x = jnp.ones((2, hw, hw, 3))
    out = ssq.forward(graph, params, qstate, x, ssq.Flags())
    assert out.shape == (2, 1000)
    outq = ssq.forward(graph, params, qstate, x,
                       ssq.Flags().all_weights(graph))
    assert jnp.isfinite(outq).all()


def test_mnasnet_blocks_are_not_special():
    graph, _ = zoo.build("mnasnet", dataset="imagenet")
    blocks = [n for n in graph if isinstance(n, BlockSpec)]
    assert all(not b.block_act_quant for b in blocks)
    # -> per-unit recon targets, no block names
    targets = ssq.quantize.reconstruction_targets(graph)
    assert not any(t in {b.name for b in blocks} for t in targets)


def test_torch_import_and_bn_fold():
    """Synthesize a torch-style state dict from the key map and check the
    importer + BN folding reproduce fold_bn of the same raw params."""
    graph, keymap_fn = zoo.build("resnet18", dataset="cifar10")
    km = keymap_fn(graph)
    rng = np.random.default_rng(0)
    sd = {}
    for u in iter_units(graph):
        conv_key, bn_key = km[u.name]
        if u.kind == "conv":
            shape = (u.out_ch, u.in_ch // u.groups, *u.kernel)
        else:
            shape = (u.out_ch, u.in_ch)
        sd[f"{conv_key}.weight"] = rng.normal(size=shape).astype(np.float32)
        if bn_key is None:
            sd[f"{conv_key}.bias"] = rng.normal(size=u.out_ch).astype(np.float32)
        else:
            sd[f"{bn_key}.weight"] = rng.uniform(0.5, 1.5, u.out_ch).astype(np.float32)
            sd[f"{bn_key}.bias"] = rng.normal(size=u.out_ch).astype(np.float32)
            sd[f"{bn_key}.running_mean"] = rng.normal(size=u.out_ch).astype(np.float32)
            sd[f"{bn_key}.running_var"] = rng.uniform(0.5, 2.0, u.out_ch).astype(np.float32)
    raw = torch_import.params_from_state_dict(graph, km, sd)
    folded = fold_bn.fold_bn(raw)
    # BN-folded conv applied to x == conv then batchnorm (reference
    # fold_bn.py:14-34 invariant), checked on one unit
    u = next(iter_units(graph))
    w, b = folded[u.name]["w"], folded[u.name]["b"]
    x = jnp.asarray(rng.normal(size=(2, 8, 8, u.in_ch)).astype(np.float32))
    from shiftedscalequantization_tpu.graph import conv2d
    y_folded = conv2d(x, w, b, u.stride, u.padding, u.groups)
    wr = jnp.asarray(sd[f"{km[u.name][0]}.weight"])
    y_raw = conv2d(x, wr, None, u.stride, u.padding, u.groups)
    bnk = km[u.name][1]
    gamma, beta = sd[f"{bnk}.weight"], sd[f"{bnk}.bias"]
    mean, var = sd[f"{bnk}.running_mean"], sd[f"{bnk}.running_var"]
    y_bn = (y_raw - mean) / np.sqrt(var + 1e-5) * gamma + beta
    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_bn),
                               rtol=2e-3, atol=2e-4)


def test_cifar_stem_differs():
    g_img = resnet.build_resnet(18, variant="imagenet")
    g_cif = resnet.build_resnet(18, num_classes=10, variant="cifar")
    u_img = next(iter_units(g_img))
    u_cif = next(iter_units(g_cif))
    assert u_img.kernel == (7, 7) and u_img.stride == (2, 2)
    assert u_cif.kernel == (3, 3) and u_cif.stride == (1, 1)
    assert not any(n.name == "model.maxpool" for n in g_cif)
