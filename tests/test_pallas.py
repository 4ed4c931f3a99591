"""Pallas kernels vs XLA/numpy references (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from shiftedscalequantization_tpu.ops import quant as Q
from shiftedscalequantization_tpu.ops.pallas import fake_quant as pfq
from shiftedscalequantization_tpu.ops.pallas import int_matmul as pmm


class TestFakeQuantKernel:
    def test_weight_matches_reference_math(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(16, 8, 3, 3)).astype(np.float32))
        qp, _ = Q.init_weight_qparams(w.reshape(16, -1), 4, False, True)
        want = Q.fake_quant(
            w, Q.QParams(delta=qp.delta.reshape(16, 1, 1, 1),
                         zero_point=qp.zero_point.reshape(16, 1, 1, 1),
                         n_bits=4, sym=False))
        got = pfq.fake_quant_weight(w, qp.delta, qp.zero_point, 4, False,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_act_per_tensor(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))
        qp = Q.init_act_qparams(x, 8, scale_method="max")
        want = Q.fake_quant(x, qp)
        got = pfq.fake_quant_act(x, qp.delta, qp.zero_point, 8,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_unaligned_shapes(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(10, 130)).astype(np.float32))
        d = jnp.full((10, 1), 0.07)
        z = jnp.full((10, 1), 8.0)
        got = pfq.fake_quant_2d(x, d, z, 0, 15, interpret=True)
        want = (jnp.clip(jnp.round(x / d) + z, 0, 15) - z) * d
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


class TestQuantMatmul:
    def test_matches_int_reference(self):
        rng = np.random.default_rng(3)
        m, k, n = 64, 128, 96
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        w = jnp.asarray(rng.integers(-7, 8, size=(k, n)).astype(np.int8))
        scale = jnp.asarray(rng.uniform(0.01, 0.1, n).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=n).astype(np.float32))
        delta, zp, nb = 0.05, 7.0, 4

        got = pmm.quant_matmul(x, w, scale, bias, delta, zp, nb,
                               interpret=True)
        q = np.clip(np.round(np.asarray(x) / delta) + zp, 0, 15) - zp
        want = (q.astype(np.int32) @ np.asarray(w, np.int32)) \
            * (np.asarray(scale) * delta) + np.asarray(bias)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-4)

    def test_relu_fusion_and_conv1x1(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
        w = jnp.asarray(rng.integers(-7, 8, size=(16, 32)).astype(np.int8))
        scale = jnp.ones(16, jnp.float32) * 0.02
        bias = jnp.zeros(16, jnp.float32)
        y = pmm.quant_conv1x1(x, w, scale, bias, 0.1, 7.0, 4, relu=True,
                              interpret=True)
        assert y.shape == (2, 8, 8, 16)
        assert float(y.min()) >= 0.0

    def test_stride_2(self):
        x = jnp.ones((1, 8, 8, 32), jnp.float32)
        w = jnp.ones((16, 32), jnp.int8)
        y = pmm.quant_conv1x1(x, w, jnp.ones(16), jnp.zeros(16), 0.1, 0.0,
                              4, stride=(2, 2), interpret=True)
        assert y.shape == (1, 4, 4, 16)


class TestPackedMatmul:
    def test_pack_unpack_roundtrip(self):
        from shiftedscalequantization_tpu.ops.pallas import packed as P
        rng = np.random.default_rng(7)
        for bits in (2, 4, 8):
            q = jnp.asarray(rng.integers(0, 2 ** bits, (67, 32)),
                            dtype=jnp.int32)
            w = P.pack_codes(q, bits)
            back = P.unpack_codes(w, bits, 67)
            np.testing.assert_array_equal(np.asarray(back), np.asarray(q))
            assert w.shape[0] == -(-67 // (32 // bits))

    def test_packed_matches_reference(self):
        from shiftedscalequantization_tpu.ops.pallas import packed as P
        rng = np.random.default_rng(8)
        m, k, n, bits = 32, 64, 48, 2
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        q_raw = rng.integers(0, 4, (k, n))
        w_zp = rng.integers(0, 4, (n,)).astype(np.float32)
        wp = P.pack_codes(jnp.asarray(q_raw, jnp.int32), bits)
        scale = jnp.asarray(rng.uniform(0.01, 0.1, n).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=n).astype(np.float32))
        delta, zp, nb = 0.05, 7.0, 4
        got = P.packed_quant_matmul(x, wp, jnp.asarray(w_zp), scale, bias,
                                    delta, zp, bits, nb, interpret=True)
        qx = np.clip(np.round(np.asarray(x) / delta) + zp, 0, 15) - zp
        wc = q_raw - w_zp[None, :]
        want = (qx @ wc) * (np.asarray(scale) * delta) + np.asarray(bias)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-4)

    def test_w4_with_relu(self):
        from shiftedscalequantization_tpu.ops.pallas import packed as P
        rng = np.random.default_rng(9)
        q_raw = rng.integers(0, 16, (128, 64))
        wp = P.pack_codes(jnp.asarray(q_raw, jnp.int32), 4)
        x = jnp.asarray(rng.normal(size=(16, 128)).astype(np.float32))
        y = P.packed_quant_matmul(
            x, wp, jnp.full((64,), 8.0), jnp.full((64,), 0.02),
            jnp.zeros(64), 0.1, 7.0, 4, 4, relu=True, interpret=True)
        assert y.shape == (16, 64) and float(y.min()) >= 0.0
