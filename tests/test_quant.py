"""Unit tests for core quantizer math vs closed-form/numpy oracles.

Oracle style follows the reference's own numpy cross-check (myQuant.py:6-44)
and validates against the semantics of quant/quant_layer.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shiftedscalequantization_tpu.ops import quant as Q
from shiftedscalequantization_tpu.ops import wquant as W


def np_fake_quant(x, delta, zp, n_bits, sym):
    n = 2 ** n_bits
    lo, hi = (-(n // 2), n // 2 - 1) if sym else (0, n - 1)
    xq = np.clip(np.round(x / delta) + zp, lo, hi)
    return (xq - zp) * delta


class TestRoundSTE:
    def test_forward_rounds(self):
        x = jnp.array([0.4, 0.6, -1.2, 2.5])
        np.testing.assert_allclose(Q.round_ste(x), np.round(np.array(x)))

    def test_gradient_is_identity(self):
        g = jax.grad(lambda x: (Q.round_ste(x) ** 2).sum())(jnp.array([0.3, 1.7]))
        # d/dx (round(x)^2) with STE = 2*round(x)
        np.testing.assert_allclose(g, 2 * np.round([0.3, 1.7]))


class TestLpLoss:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        a, b = rng.normal(size=(4, 8)), rng.normal(size=(4, 8))
        want = (np.abs(a - b) ** 2.4).sum(1).mean()
        got = Q.lp_loss(jnp.array(a), jnp.array(b), p=2.4)
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestFakeQuant:
    @pytest.mark.parametrize("sym", [False, True])
    def test_roundtrip_exact_levels(self, sym):
        n_bits = 4
        delta = jnp.float32(0.1)
        zp = jnp.float32(0.0 if sym else 7.0)
        qp = Q.QParams(delta=delta, zero_point=zp, n_bits=n_bits, sym=sym)
        x = np.linspace(-0.7, 0.7, 29).astype(np.float32)
        got = Q.fake_quant(jnp.array(x), qp)
        want = np_fake_quant(x, 0.1, float(zp), n_bits, sym)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_ste_gradient(self):
        qp = Q.QParams(delta=jnp.float32(0.1), zero_point=jnp.float32(8.0),
                       n_bits=4, sym=False)
        x = jnp.array([0.25, -0.33])
        g = jax.grad(lambda v: Q.fake_quant(v, qp).sum())(x)
        np.testing.assert_allclose(g, [1.0, 1.0])


class TestScaleInit:
    def test_minmax_asym(self):
        x = jnp.array([-1.0, 0.0, 2.0, 3.0])
        delta, zp, raw = Q.init_scale_minmax(x, n_bits=4, sym=False)
        np.testing.assert_allclose(delta, 4.0 / 15, rtol=1e-6)
        np.testing.assert_allclose(zp, round(1.0 / (4.0 / 15)))
        np.testing.assert_allclose(raw, 1.0)

    def test_minmax_sym(self):
        x = jnp.array([-3.0, 2.0])
        delta, zp, _ = Q.init_scale_minmax(x, n_bits=4, sym=True)
        np.testing.assert_allclose(delta, 6.0 / 15, rtol=1e-6)
        # sym min = -absmax -> zp = round(absmax/delta); compute the oracle
        # from the returned float32 delta (3/0.4f straddles .5 exactly)
        np.testing.assert_allclose(zp, np.round(3.0 / np.asarray(delta)))

    def test_mse_grid_beats_or_matches_full_range(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=512).astype(np.float32) * 0.1
        x[0] = 5.0  # outlier the grid should clip away
        delta_m, zp_m, _ = Q.init_scale_mse(jnp.array(x), n_bits=4, sym=False)
        delta_f, zp_f, _ = Q.init_scale_minmax(jnp.array(x), n_bits=4, sym=False)

        def score(delta, zp):
            xq = np_fake_quant(x, float(delta), float(zp), 4, False)
            return (np.abs(xq - x) ** 2.4).mean()

        assert score(delta_m, zp_m) <= score(delta_f, zp_f)
        assert float(delta_m) < float(delta_f)  # clipped the outlier

    def test_mse_grid_oracle(self):
        """Exhaustive numpy replication of the 80-step grid (quant_layer.py:144-162)."""
        rng = np.random.default_rng(2)
        x = rng.normal(size=256).astype(np.float32)
        n_bits = 3
        delta, zp, _ = Q.init_scale_mse(jnp.array(x), n_bits=n_bits, sym=False)
        best, bd, bzp = 1e10, None, None
        for i in range(80):
            nm, nn = x.max() * (1 - i * 0.01), x.min() * (1 - i * 0.01)
            d = (nm - nn) / (2 ** n_bits - 1)
            z = np.round(-nn / d)
            xq = np.clip(np.round(x / d) + z, 0, 2 ** n_bits - 1)
            xdq = (xq - z) * d
            s = (np.abs(xdq - x) ** 2.4).mean()
            if s < best:
                best, bd, bzp = s, d, z
        np.testing.assert_allclose(delta, bd, rtol=1e-5)
        np.testing.assert_allclose(zp, bzp)

    def test_per_channel_vmap(self):
        rng = np.random.default_rng(3)
        w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
        qp, raw = Q.init_weight_qparams(jnp.array(w.reshape(8, -1)),
                                        n_bits=4, sym=False, channel_wise=True)
        assert qp.delta.shape == (8, 1)
        # each channel's init equals the single-slice init
        d0, z0, _ = Q.init_scale_mse(jnp.array(w[3].ravel()), 4, False)
        np.testing.assert_allclose(qp.delta[3, 0], d0, rtol=1e-6)
        np.testing.assert_allclose(qp.zero_point[3, 0], z0)


class TestSoftTargets:
    def test_sigmoid_inverse_roundtrip(self):
        rest = jnp.array([0.01, 0.3, 0.5, 0.77, 0.99])
        a = Q.inverse_rectified_sigmoid(rest)
        np.testing.assert_allclose(Q.rectified_sigmoid(a), rest, atol=1e-5)

    def test_softmax_inverse_roundtrip(self):
        """The reference's inverse_softmax (channelQuant.py:193-199) is only
        an approximate inverse (rectified probs don't renormalize); check we
        match its formula exactly and that argmax/ordering survive."""
        p = np.array([[0.33, 0.335, 0.335], [0.8, 0.1, 0.1]], np.float32)
        logits = np.asarray(Q.inverse_rectified_softmax(jnp.array(p)))
        x = (p - Q.GAMMA) / (Q.ZETA - Q.GAMMA)
        want = np.log(x) - np.log(x).mean(axis=-1, keepdims=True)
        np.testing.assert_allclose(logits, want, atol=1e-4, rtol=2e-3)
        back = np.asarray(Q.rectified_softmax(jnp.array(logits)))
        np.testing.assert_allclose(back, p, atol=0.08)  # approximate inverse
        assert (back.argmax(-1) == p.argmax(-1)).all()

    def test_temp_decay_endpoints(self):
        # warmup region returns start_b; end returns end_b (block_recon.py:185-202)
        assert float(Q.linear_temp_decay(0, 1000)) == 20.0
        assert float(Q.linear_temp_decay(100, 1000)) == 20.0
        np.testing.assert_allclose(Q.linear_temp_decay(1000, 1000), 2.0)
        mid = float(Q.linear_temp_decay(600, 1000))
        assert 2.0 < mid < 20.0


class TestAdaRound:
    def test_init_soft_equals_fp(self):
        """With alpha init s.t. sigmoid(alpha)=rest, soft forward == exact
        value when within clamp range (adaptive_rounding.py:66-74)."""
        rng = np.random.default_rng(4)
        # keep codes strictly inside [0 - zp, 15 - zp] so clamping is inactive
        w = rng.uniform(-0.39, 0.34, size=(6, 5)).astype(np.float32)
        qp = Q.QParams(delta=jnp.full((6, 1), 0.05), zero_point=jnp.full((6, 1), 8.0),
                       n_bits=4, sym=False)
        wq = W.init_adaround(qp, jnp.array(w))
        out = wq(jnp.array(w))
        np.testing.assert_allclose(out, w, atol=1e-5)

    def test_hard_rounds_to_grid(self):
        rng = np.random.default_rng(5)
        w = rng.uniform(-0.4, 0.4, size=(6, 5)).astype(np.float32)
        qp = Q.QParams(delta=jnp.full((6, 1), 0.05), zero_point=jnp.full((6, 1), 8.0),
                       n_bits=4, sym=False)
        import dataclasses
        wq = dataclasses.replace(W.init_adaround(qp, jnp.array(w)), soft=False)
        out = np.asarray(wq(jnp.array(w)))
        codes = out / 0.05
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)


class TestUniformWQ:
    def test_per_channel_broadcast(self):
        rng = np.random.default_rng(6)
        w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
        qp, _ = Q.init_weight_qparams(jnp.array(w.reshape(4, -1)), 4, False, True)
        wq = W.UniformWQ(qp=qp)
        out = np.asarray(wq(jnp.array(w)))
        for c in range(4):
            want = np_fake_quant(w[c], float(qp.delta[c, 0]),
                                 float(qp.zero_point[c, 0]), 4, False)
            np.testing.assert_allclose(out[c], want, atol=1e-6)


class TestActBitOverrides:
    def test_per_site_override_applies_and_unknown_raises(self):
        """Mixed-precision acts (quantize.calibrate_acts bit_overrides):
        the 8-bit head/stem rule generalized to any act site (motivated
        by the R50 A4 single-site bottleneck, ACCURACY_r50_r5.md)."""
        import jax
        import pytest

        import shiftedscalequantization_tpu as ssq
        from shiftedscalequantization_tpu.models import resnet

        graph = resnet.build_resnet(18, num_classes=10, variant="cifar")
        raw = resnet.init_params(jax.random.PRNGKey(0), graph)
        cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=4)
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
        qs = ssq.calibrate_acts(graph, params, qstate, x, cfg,
                                bit_overrides={"model.layer2.0": 8})
        assert qs["model.layer2.0"].n_bits == 8       # block act site
        assert qs["model.layer3.0"].n_bits == 4       # untouched
        # forward runs with the mixed grids
        from shiftedscalequantization_tpu.quantize import act_flags
        fl = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
        out = ssq.forward(graph, params, qs, x, fl)
        assert out.shape == (8, 10)
        with pytest.raises(KeyError):
            ssq.calibrate_acts(graph, params, qstate, x, cfg,
                               bit_overrides={"no.such.site": 8})
