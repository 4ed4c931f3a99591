"""Importer round-trip on BRECQ-release-format checkpoints (all families).

The reference loads its pretrained weights from `.pth.tar` release files
(trash/hubconf.py:16-68): a flat `model.state_dict()` for
resnet18/resnet50/regnetx/mnasnet and `{'model': state_dict}` for
mobilenetv2. No network exists here, so this synthesizes checkpoints in
EXACTLY those formats from the actual reference torch models (randomly
initialized), round-trips them through utils/torch_import, and asserts
end-to-end FP logit parity between the reference torch forward and this
framework's folded JAX forward — proving "real ImageNet weights are a
flag flip" at the format level for every family.

Skipped when /root/reference is absent (same policy as
test_reference_parity.py).
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")

import jax.numpy as jnp

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu.models import zoo
from shiftedscalequantization_tpu.utils import torch_import


@pytest.fixture(scope="module")
def ref_models():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.mnasnet import mnasnet
    from models.mobilenetv2 import mobilenetv2
    from models.regnet import regnetx_600m
    from models.resnet import resnet18, resnet50
    return {"resnet18": resnet18, "resnet50": resnet50,
            "mobilenetv2": mobilenetv2, "regnetx_600m": regnetx_600m,
            "mnasnet": mnasnet}


# hubconf checkpoint wrapping per family (trash/hubconf.py)
WRAP = {"mobilenetv2": "model"}


@pytest.mark.parametrize("arch", ["resnet18", "resnet50", "mobilenetv2",
                                  "regnetx_600m", "mnasnet"])
def test_pth_tar_roundtrip_logit_parity(arch, ref_models, tmp_path):
    import torch
    torch.manual_seed(0)
    model = ref_models[arch]()
    model.eval()
    # randomize BN running stats too — fresh init has mean=0/var=1, which
    # would let a broken fold pass unnoticed
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    sd = model.state_dict()
    path = str(tmp_path / f"{arch}_imagenet.pth.tar")
    torch.save({WRAP[arch]: sd} if arch in WRAP else sd, path)

    graph, km_fn = zoo.build(arch, dataset="imagenet")
    km = km_fn(graph)
    loaded = torch_import.load_state_dict(path)
    raw = torch_import.params_from_state_dict(graph, km, loaded)

    cfg = ssq.QuantConfig(n_bits_w=8, n_bits_a=8)
    params, qstate = ssq.prepare_model(graph, raw, cfg)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(
            np.transpose(x, (0, 3, 1, 2)))).numpy()
    out = np.asarray(ssq.forward(graph, params, qstate, jnp.asarray(x),
                                 ssq.Flags()))
    assert out.shape == ref_out.shape
    # BN folding + conv reassociation: parity to ~1e-3 relative
    denom = np.abs(ref_out).max() + 1e-9
    rel = np.abs(out - ref_out).max() / denom
    assert rel < 2e-3, (arch, rel)
