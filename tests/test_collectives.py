"""Quantized (int8-wire) gradient collectives + explicit-DDP recon."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu.models import resnet
from shiftedscalequantization_tpu.parallel.collectives import quantized_pmean
from shiftedscalequantization_tpu.parallel.mesh import make_mesh
from shiftedscalequantization_tpu.recon import ReconSettings
from shiftedscalequantization_tpu.recon.capture import capture_io


def _mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 faked devices")
    return make_mesh(n_data=8)


class TestQuantizedPmean:
    def test_matches_pmean_within_one_step(self):
        mesh = _mesh8()
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 3, 257))

        def body(v):
            return quantized_pmean(v, "data")

        f = shard_map(body, mesh=mesh, in_specs=P("data"),
                      out_specs=P("data"), check_vma=False)
        with mesh:
            got = np.asarray(f(x))
        want = np.asarray(x.mean(axis=0, keepdims=True))
        # every device must hold the same mean; one quantization of each
        # contribution -> error <= delta/2 = amax/254 per element
        tol = float(jnp.abs(x).max()) / 254.0 + 1e-7
        for d in range(8):
            np.testing.assert_allclose(got[d], want[0], atol=tol)

    def test_replicated_result_bit_identical_across_devices(self):
        mesh = _mesh8()
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 640))
        f = shard_map(lambda v: quantized_pmean(v, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)
        with mesh:
            got = np.asarray(f(x))
        for d in range(1, 8):
            np.testing.assert_array_equal(got[d], got[0])

    def test_small_tensor_falls_back_exact(self):
        mesh = _mesh8()
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 2))
        f = shard_map(lambda v: quantized_pmean(v, "data"), mesh=mesh,
                      in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)
        with mesh:
            got = np.asarray(f(x))
        np.testing.assert_allclose(got[0], np.asarray(x.mean(0)),
                                   rtol=1e-6)


@pytest.mark.slow
class TestDDPReconstruct:
    def _setup(self):
        graph = resnet.build_resnet(18, num_classes=10, variant="cifar")
        raw = resnet.init_params(jax.random.PRNGKey(0), graph)
        cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4)
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 32, 32, 3))
        base = ssq.Flags()
        tgt = "model.layer1.0"
        ci, co = capture_io(graph, params, qstate, tgt, x, base, base,
                            batch_size=32)
        return graph, params, qstate, tgt, ci, co

    def test_f32_and_int8_wire_both_reconstruct(self):
        from shiftedscalequantization_tpu.parallel.dist import \
            ddp_reconstruct
        mesh = _mesh8()
        graph, params, qstate, tgt, ci, co = self._setup()
        s = ReconSettings(mode="fused", iters=24, batch_size=32, chunk=8)
        out = {}
        for wire in ("f32", "int8"):
            _, m = ddp_reconstruct(graph, params, qstate, tgt, ci, co, s,
                                   jax.random.PRNGKey(2), mesh, wire=wire)
            out[wire] = m
            tr = np.asarray(m["rec_trace"])
            assert tr.shape[0] == 24
            # optimizing: the loss trace must actually decrease
            assert tr[-8:].mean() < tr[:8].mean(), (wire, tr)
        # int8-wire gradients track the f32 run closely (same sampling)
        a = float(out["f32"]["hard_loss"])
        b = float(out["int8"]["hard_loss"])
        assert abs(a - b) / max(abs(a), 1e-9) < 0.25, (a, b)
