"""Fused shifted-scale with dequant='effective' (the paper's intended
per-candidate step-size semantics).

The reference's fused 'adaShift' path resets shiftedScale to 1.0 after
init_v_beta (channelQuant.py:287) and dequantizes the mixed codes at the
BASE delta (channelQuant.py:63) — so a candidate st effectively multiplies
the weight by 1/st, which only makes sense for st ~= 1 (the snapshot's
{31/32, 33/32, 1}). dequant='effective' realizes the intended semantics
(get_delta/update_delta, channelQuant.py:221-237,296-298): each candidate's
codes dequantize at delta*st, making coarse candidate sets ({1/4,1/2,1})
act as finer per-input-channel grids.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shiftedscalequantization_tpu.ops import quant as Q
from shiftedscalequantization_tpu.ops import wquant as W

STS = (0.25, 0.5, 1.0)


def _imbalanced_w(seed=0, oc=8, ic=12, k=3):
    """Conv weight whose input-channel thirds span a 4x scale range —
    the regime the shifted-scale method exists for."""
    rng = np.random.RandomState(seed)
    w = rng.randn(oc, ic, k, k).astype(np.float32)
    s = np.ones(ic, np.float32)
    s[: ic // 3] = 0.25
    s[ic // 3: 2 * (ic // 3)] = 0.5
    return jnp.asarray(w * s[None, :, None, None]), s


def _qp(w, n_bits=2):
    res = Q.init_weight_qparams(w.reshape(w.shape[0], -1), n_bits,
                                sym=False, channel_wise=True,
                                scale_method="max")
    return res[0] if isinstance(res, tuple) else res


class TestEffectiveDequant:
    def test_hard_beats_adaround_on_imbalanced_channels(self):
        w, _ = _imbalanced_w()
        qp = _qp(w)
        wq = W.init_shifted_scale(qp, w, STS, dequant="effective")
        hard = dataclasses.replace(wq, hard_targets=True, hard_round=True)
        mse_eff = float(((hard(w) - w) ** 2).mean())
        ar = dataclasses.replace(W.init_adaround(qp, w), soft=False)
        mse_ar = float(((ar(w) - w) ** 2).mean())
        assert mse_eff < 0.8 * mse_ar, (mse_eff, mse_ar)

    def test_init_selection_tracks_planted_imbalance(self):
        w, s = _imbalanced_w()
        qp = _qp(w)
        wq = W.init_shifted_scale(qp, w, STS, dequant="effective")
        sel = np.asarray(jnp.argmax(wq.soft_targets(), -1))
        # small channels (scaled by 0.25) should pick the 0.25 candidate
        want = np.searchsorted(np.asarray(STS), s)
        assert (sel == want).mean() >= 0.75, (sel, want)

    def test_baked_equals_hard_forward(self):
        w, _ = _imbalanced_w(seed=3)
        qp = _qp(w)
        wq = W.init_shifted_scale(qp, w, STS, dequant="effective")
        # perturb logits so selections/roundings are non-trivial
        key = jax.random.PRNGKey(0)
        wq = dataclasses.replace(
            wq,
            alpha=wq.alpha + jax.random.normal(key, wq.alpha.shape),
            beta=wq.beta + jax.random.normal(key, wq.beta.shape))
        hard = dataclasses.replace(wq, hard_targets=True, hard_round=True)
        baked = W.shifted_to_baked(wq)
        np.testing.assert_array_equal(np.asarray(hard(w)),
                                      np.asarray(baked(w)))
        assert baked.st_index is not None and not baked.soft

    def test_unit_mode_unchanged_for_near_one_targets(self):
        """dequant='unit' (default) keeps the reference-faithful fused
        semantics: candidates near 1 mix floor codes dequantized at the
        base delta."""
        w, _ = _imbalanced_w(seed=5)
        qp = _qp(w, n_bits=4)
        sts = (1 - 1 / 32, 1 + 1 / 32, 1.0)
        wq_unit = W.init_shifted_scale(qp, w, sts)
        wq_expl = W.init_shifted_scale(qp, w, sts, dequant="unit")
        np.testing.assert_allclose(np.asarray(wq_unit(w)),
                                   np.asarray(wq_expl(w)), rtol=1e-6)
        assert wq_unit.dequant == "unit"

    def test_effective_linear_layer(self):
        rng = np.random.RandomState(1)
        w = rng.randn(10, 24).astype(np.float32)
        w[:, :8] *= 0.25
        w = jnp.asarray(w)
        qp = _qp(w)
        wq = W.init_shifted_scale(qp, w, STS, dequant="effective")
        hard = dataclasses.replace(wq, hard_targets=True, hard_round=True)
        baked = W.shifted_to_baked(wq)
        np.testing.assert_array_equal(np.asarray(hard(w)),
                                      np.asarray(baked(w)))
        ar = dataclasses.replace(W.init_adaround(qp, w), soft=False)
        assert float(((hard(w) - w) ** 2).mean()) < \
            float(((ar(w) - w) ** 2).mean())

    def test_soft_grad_flows_to_alpha_and_beta(self):
        w, _ = _imbalanced_w(seed=7)
        qp = _qp(w)
        wq = W.init_shifted_scale(qp, w, STS, dequant="effective")

        def loss(alpha, beta):
            q = dataclasses.replace(wq, alpha=alpha, beta=beta)
            return ((q(w) - w) ** 2).sum()

        ga, gb = jax.grad(loss, argnums=(0, 1))(wq.alpha, wq.beta)
        assert float(jnp.abs(ga).max()) > 0
        assert float(jnp.abs(gb).max()) > 0


class TestEffectiveDeploy:
    def test_deploy_parity_on_baked_effective_state(self):
        """End-to-end: recon a tiny model in fused/effective mode, harden,
        and check true-int deploy == sim on the hardened state."""
        import shiftedscalequantization_tpu as ssq
        from shiftedscalequantization_tpu import deploy
        from shiftedscalequantization_tpu.models import resnet, zoo
        from shiftedscalequantization_tpu.quantize import act_flags
        from shiftedscalequantization_tpu.recon import ReconSettings, \
            reconstruct_model

        graph, _ = zoo.build("resnet18", dataset="cifar10", num_classes=10)
        raw = resnet.init_params(jax.random.PRNGKey(0), graph)
        cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max",
                              a_scale_method="max")
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        calib = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))
        qstate = ssq.calibrate_acts(graph, params, qstate, calib, cfg)
        s = ReconSettings(mode="fused", iters=3, batch_size=8,
                          shift_targets=STS, fused_dequant="effective",
                          opt_beta=True)
        qstate, _, _ = reconstruct_model(graph, params, qstate,
                                         ["model.layer1.0"], calib, s,
                                         jax.random.PRNGKey(2),
                                         batch_size=16)
        flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 3))
        sim = ssq.forward(graph, params, qstate, x, flags)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps,
                                       input_hw=(32, 32))
        dep = deploy.deploy_forward(graph, dparams, steps, x, plan)

        # the baked unit itself carries the grouped scale-table form, and
        # its deploy weight reconstruction (sum_s w_groups[s]*gscales[s])
        # is bit-exact vs the hardened fake-quant weight
        name = "model.layer1.0.conv1"
        du = dparams[name]
        assert du.w_groups is not None
        assert du.w_groups.shape[0] == len(STS)
        w = params[name]["w"]
        want = qstate[name].wq(w)
        got = sum(du.w_groups[s].astype(jnp.float32)
                  * du.group_scales[s].reshape(-1, 1, 1, 1)
                  for s in range(len(STS)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

        # full-net parity on the chaotic random-weight fixture: boundary
        # code flips amplify, so match the established deploy-test bar
        # (test_deploy.py test_baked_shift_grouped_int_deploy_matches_sim)
        rel = float(jnp.abs(sim - dep).mean() /
                    (jnp.abs(sim).mean() + 1e-9))
        assert rel < 0.15, rel
        assert (jnp.argmax(sim, -1) == jnp.argmax(dep, -1)).mean() >= 0.95


class TestPostHardenRefine:
    def test_refine_recovers_hardening_loss(self):
        """Coarse candidates make the soft fused mixture a crutch that
        vanishes at argmax (x16 demo: soft 0.82 -> hard 18.8); the
        post-harden rounding-only refinement (post_round_frac) must pull
        the hard loss back toward the soft loss at UNCHANGED total
        iteration budget."""
        import dataclasses

        import shiftedscalequantization_tpu as ssq
        from shiftedscalequantization_tpu.models import resnet, zoo
        from shiftedscalequantization_tpu.recon import ReconSettings, \
            capture_io, reconstruct_node
        from shiftedscalequantization_tpu.graph import Flags

        graph, _ = zoo.build("resnet18", dataset="cifar10", num_classes=10)
        raw = resnet.init_params(jax.random.PRNGKey(0), graph)
        cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max",
                              a_scale_method="max")
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        calib = jax.random.normal(jax.random.PRNGKey(1), (32, 32, 32, 3))
        qstate = ssq.calibrate_acts(graph, params, qstate, calib, cfg)
        ci, co = capture_io(graph, params, qstate, "model.layer1.0", calib,
                            inp_flags=Flags(), out_flags=Flags(),
                            batch_size=16)
        base = dict(mode="fused", iters=60, batch_size=16,
                    shift_targets=(0.0625, 0.25, 1.0),
                    fused_dequant="effective", opt_beta=True)
        s_off = ReconSettings(**base, post_round_frac=0.0)
        s_on = ReconSettings(**base, post_round_frac=0.5)
        _, m_off = reconstruct_node(graph, params, qstate, "model.layer1.0",
                                    ci, co, s_off, jax.random.PRNGKey(2))
        qs_on, m_on = reconstruct_node(graph, params, qstate,
                                       "model.layer1.0", ci, co, s_on,
                                       jax.random.PRNGKey(2))
        h_off = float(m_off["hard_loss"])
        h_pre = float(m_on["hard_loss_prerefine"])
        h_on = float(m_on["hard_loss"])
        # refinement must improve on its own pre-refine hard loss, and
        # beat the no-refine run at the same total budget
        assert h_on < h_pre, (h_on, h_pre)
        assert h_on < h_off, (h_on, h_off)
        # hardened form stays the deployable baked AdaRound
        from shiftedscalequantization_tpu.ops import wquant as W
        wq = qs_on["model.layer1.0.conv1"].wq
        assert isinstance(wq, W.AdaRoundWQ) and wq.st_index is not None \
            and not wq.soft
