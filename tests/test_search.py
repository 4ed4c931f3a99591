"""Greedy/random selection search tests."""
import numpy as np
import jax
import jax.numpy as jnp

from shiftedscalequantization_tpu.graph import UnitSpec
from shiftedscalequantization_tpu.ops import quant as Q
from shiftedscalequantization_tpu.recon import search as S


def make_qp(w, n_bits=4):
    qp, _ = Q.init_weight_qparams(jnp.asarray(w.reshape(w.shape[0], -1)),
                                  n_bits, False, True, scale_method="max")
    return qp


class TestWeightGreedy:
    def test_is_per_pair_argmin(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(6, 4, 3, 3)).astype(np.float32))
        qp = make_qp(np.asarray(w))
        cands = S.candidate_weights(qp, w, (0.5, 1.0))
        sel, loss = S.weight_greedy_selection(w, cands)
        # brute force over each pair
        err = np.asarray(jnp.abs(cands - w[None]) ** 2.4).reshape(2, 6, 4, -1).sum(-1)
        np.testing.assert_array_equal(np.asarray(sel), err.argmin(0))
        # exhaustive optimality per pair: no single flip improves
        assert np.isclose(float(loss), err.min(0).sum(), rtol=1e-5)


class TestDistSelection:
    def test_matches_reference_rule(self):
        """run_layerDist brute force (quant_layer.py:361-405): per-pair L2
        argmin over effective steps delta / qParam[k], qParam = (1.0, 0.5)."""
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(size=(5, 3, 3, 3)).astype(np.float32))
        qp = make_qp(np.asarray(w))
        sel, _ = S.dist_selection(qp, w)
        wn = np.asarray(w)
        delta = np.asarray(qp.delta).reshape(5, 1, 1, 1)
        zp = np.asarray(qp.zero_point).reshape(5, 1, 1, 1)
        losses = []
        for q in (1.0, 0.5):
            step = delta / q
            xq = np.clip(np.round(wn / step) + zp, 0, 2 ** 4 - 1)
            deq = (xq - zp) * step
            losses.append((np.abs(deq - wn) ** 2).reshape(5, 3, -1).sum(-1))
        want = np.stack(losses).argmin(0)
        np.testing.assert_array_equal(np.asarray(sel), want)


class TestOutputGreedy:
    def test_linear_beats_all_base(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(5, 8)).astype(np.float32) * 0.3)
        qp = make_qp(np.asarray(w))
        cands = S.candidate_weights(qp, w, (0.5, 1.0))
        x = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
        tgt = x @ w.T  # FP target
        spec = UnitSpec("u", "linear", 8, 5)
        sel, loss = S.output_greedy_selection(spec, cands, x, tgt)
        base_out = x @ S.apply_selection(cands, jnp.zeros((5, 8), jnp.int32)).T
        base_loss = float((jnp.abs(base_out - tgt) ** 2).sum(-1).mean())
        assert float(loss) <= base_loss + 1e-6

    def test_conv_runs_and_improves(self):
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(size=(4, 3, 3, 3)).astype(np.float32) * 0.3)
        qp = make_qp(np.asarray(w))
        cands = S.candidate_weights(qp, w, (0.5, 1.0))
        x = jnp.asarray(rng.normal(size=(8, 6, 6, 3)).astype(np.float32))
        spec = UnitSpec("u", "conv", 3, 4, kernel=(3, 3), padding=(1, 1))
        tgt = S._unit_out(spec, w, x)
        sel, loss = S.output_greedy_selection(spec, cands, x, tgt)
        base_out = S._unit_out(
            spec, S.apply_selection(cands, jnp.zeros((4, 3), jnp.int32)), x)
        base_loss = float((jnp.abs(base_out - tgt) ** 2).sum(-1).mean())
        assert float(loss) <= base_loss + 1e-6
        assert sel.shape == (4, 3)


class TestRandomSelection:
    def test_distribution_and_determinism(self):
        key = jax.random.PRNGKey(0)
        sel = S.random_selection(key, 64, 64, 3, prob_nonbase=0.5)
        frac0 = float((sel == 0).mean())
        assert 0.4 < frac0 < 0.6
        assert int(sel.max()) <= 2
        sel2 = S.random_selection(key, 64, 64, 3, prob_nonbase=0.5)
        np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel2))
