"""Round-2 deploy-path additions: packed execution, clamp-activation
folding, per-channel (ActShiftQuant) site transport."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu import deploy
from shiftedscalequantization_tpu.graph import UnitQuant, find_node
from shiftedscalequantization_tpu.models import resnet
from shiftedscalequantization_tpu.quantize import act_flags


def build(nbw=2, nba=4):
    graph = resnet.build_resnet(18, num_classes=10, variant="cifar")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=nbw, n_bits_a=nba, w_scale_method="max",
                          a_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
    flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
    return graph, params, qstate, x, flags


class TestClampFolding:
    def test_fold_is_exact_vs_separate_activation(self):
        """code() is monotone, so code(clip(x,0,6)) == clip(code(x),
        code(0), code(6)) — the algebra quantize_out relies on."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(4096,)).astype(np.float32) * 8
        for act_hi, zp, d, hi in [(6.0, 0, 0.43, 15), (6.0, 3, 0.391, 15),
                                  (6.0, 0, 0.05, 15), (None, 5, 0.21, 15)]:
            xa = np.clip(x, 0.0, act_hi if act_hi else None)
            old = np.clip(np.floor(xa / d + 0.5) + zp, 0, hi)
            lo_f = max(0.0, zp)
            hi_f = min(hi, np.floor(act_hi / d + 0.5) + zp) if act_hi \
                else hi
            new = np.clip(np.floor(x / d + 0.5) + zp, lo_f, hi_f)
            np.testing.assert_array_equal(old, new)

    def test_full_net_deploy_still_matches_sim(self):
        """relu folding must not change deploy outputs (W4A8 keeps the
        per-layer drift small enough for a tight check)."""
        graph, params, qstate, x, flags = build(4, 8)
        sim = ssq.forward(graph, params, qstate, x, flags)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        dep = deploy.deploy_forward(graph, dparams, steps, x)
        rel = float(jnp.abs(sim - dep).mean() / (jnp.abs(sim).mean() + 1e-9))
        assert rel < 0.02, rel


class TestPackedDeploy:
    def test_packed_plan_kind_actually_executes(self, monkeypatch):
        """SSQ_PACKED=1 routes 1x1 convs through the Pallas packed kernel
        (round-1 gap: the plan kind existed but run_unit silently fell
        through to the float path) and matches the default deploy."""
        graph, params, qstate, x, flags = build(2, 4)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)

        monkeypatch.setenv("SSQ_PACKED", "1")
        plan_p = deploy.make_deploy_plan(graph, dparams, steps)
        kinds = [v[0] for k, v in plan_p.items() if not k.startswith("__")]
        assert "packed" in kinds, kinds
        # downsample 1x1s are stride-2: the strided-subsample path runs
        packed_units = [k for k, v in plan_p.items()
                        if not k.startswith("__") and v[0] == "packed"]
        assert any("downsample" in n for n in packed_units), packed_units
        dep_p = deploy.deploy_forward(graph, dparams, steps, x, plan_p)

        monkeypatch.setenv("SSQ_PACKED", "0")
        plan_0 = deploy.make_deploy_plan(graph, dparams, steps)
        dep_0 = deploy.deploy_forward(graph, dparams, steps, x, plan_0)
        rel = float(jnp.abs(dep_p - dep_0).mean()
                    / (jnp.abs(dep_0).mean() + 1e-9))
        assert rel < 1e-4, rel


class TestActShiftDeploy:
    def test_per_channel_site_transports_f32_and_matches_sim(self):
        """A hardened ActShiftQuant block site has a per-channel step; the
        plan must NOT class it as an int8/biased code edge (the per-IC
        step cannot factor out of the consumer conv as an output scale)
        and the f32-edge fallback must match sim."""
        from shiftedscalequantization_tpu.ops.act_quant import ActShiftQuant
        from shiftedscalequantization_tpu.ops import quant as Q

        graph, params, qstate, x, flags = build(2, 4)
        name = next(n for n, v in qstate.items()
                    if v is not None and not isinstance(v, UnitQuant))
        node = find_node(graph, name)
        c = node.units[-1].out_ch
        qp = qstate[name]
        # alternate targets 1.0 / 0.5 across channels -> genuinely
        # per-channel effective delta
        p = jax.nn.one_hot(jnp.arange(c) % 2, 2, dtype=jnp.float32)
        asq = ActShiftQuant(qp=qp,
                            alpha=Q.inverse_rectified_softmax(
                                p * 0.8 + (1 - p) * 0.2),
                            shift_targets=(1.0, 0.5), hard_targets=True)
        qstate = dict(qstate)
        qstate[name] = asq

        steps = deploy.act_steps_from_qstate(graph, qstate)
        assert np.asarray(steps[name][0]).size == c  # per-channel step
        dparams = deploy.build_deploy_params(graph, params, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps)
        assert name not in plan["__int8_sites__"]
        assert name not in plan.get("__biased_sites__", frozenset())

        sim = ssq.forward(graph, params, qstate, x, flags)
        dep = deploy.deploy_forward(graph, dparams, steps, x, plan)
        rel = float(jnp.abs(sim - dep).mean() / (jnp.abs(sim).mean() + 1e-9))
        # W2A4 end-to-end tie-flips amplify; top-1 agreement + bounded drift
        assert rel < 0.15, rel
        assert (np.asarray(sim).argmax(-1)
                == np.asarray(dep).argmax(-1)).mean() >= 0.99


@pytest.mark.slow
class TestSitelessBlockTransport:
    """MNASNet is encoded per-unit (no block act sites): non-residual
    blocks must pass codes through and siteless residual sums must travel
    as exact code pairs, not materialized f32 (round-2 fix: 17 of its
    convs ran the 2-pass float path)."""

    def _setup(self, nbw, nba):
        import jax
        from shiftedscalequantization_tpu.models import resnet, zoo
        graph, _ = zoo.build("mnasnet", dataset="imagenet")
        raw = resnet.init_params(jax.random.PRNGKey(0), graph)
        cfg = ssq.QuantConfig(n_bits_w=nbw, n_bits_a=nba,
                              w_scale_method="max", a_scale_method="max")
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
        qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
        return graph, params, qstate, x, act_flags(
            graph, cfg, base=ssq.Flags().all_weights(graph))

    def test_mnasnet_w2a4_code_transport(self):
        """W2A4: unit sites are 4-bit codes, so both the pass-through and
        the n-term pair decomposition exercise. Per-logit comparison only
        (a single random sample at W2 amplifies the accepted 1-ulp tie
        flips chaotically; the tight check is the W4A8 test below)."""
        graph, params, qstate, x, flags = self._setup(2, 4)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps)
        # codes pass through non-residual siteless blocks: the expand conv
        # after each stage-opening block must NOT run the float path
        # (before the fix every one of these was 'float')
        fixed = [k for k, v in plan.items()
                 if not k.startswith("__") and ".1.layers.0" in k]
        assert fixed, "expected stage .1 expand convs in the plan"
        for k in fixed:
            assert not plan[k][0].startswith("float"), (k, plan[k])
        sim = ssq.forward(graph, params, qstate, x, flags)
        dep = deploy.deploy_forward(graph, dparams, steps, x, plan)
        rel = float(jnp.abs(sim - dep).mean() / (jnp.abs(sim).mean() + 1e-9))
        assert rel < 0.2, rel

    def test_mnasnet_w4a8_matches_sim_tightly(self):
        graph, params, qstate, x, flags = self._setup(4, 8)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        sim = ssq.forward(graph, params, qstate, x, flags)
        dep = deploy.deploy_forward(graph, dparams, steps, x)
        rel = float(jnp.abs(sim - dep).mean() / (jnp.abs(sim).mean() + 1e-9))
        assert rel < 0.03, rel
        assert int(np.asarray(sim).argmax()) == int(np.asarray(dep).argmax())

    def test_pair_term_cap(self, monkeypatch):
        """SSQ_PAIR_TERMS caps the deferred code-sum depth (liveness bound
        for the XLA:TPU compile probe, NEXT.md #1): both cap settings must
        stay tight vs sim — a capped chain materializes f32, which is
        exact, and the int8 pair-term convs are exact by linearity."""
        import jax as _jax
        from shiftedscalequantization_tpu.models import resnet as _resnet
        from shiftedscalequantization_tpu.models import zoo
        graph, _ = zoo.build("mnasnet", dataset="imagenet")
        raw = _resnet.init_params(_jax.random.PRNGKey(0), graph)
        cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=8,
                              w_scale_method="max", a_scale_method="max")
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        x = _jax.random.normal(_jax.random.PRNGKey(1), (1, 64, 64, 3))
        qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
        sim = ssq.forward(graph, params, qstate, x, flags)
        plan = deploy.make_deploy_plan(graph, dparams, steps,
                                       input_hw=(64, 64))
        formed = {}
        for cap in ("2", "3"):
            monkeypatch.setenv("SSQ_PAIR_TERMS", cap)
            dep = deploy.deploy_forward(graph, dparams, steps, x, plan=plan)
            rel = float(jnp.abs(sim - dep).mean()
                        / (jnp.abs(sim).mean() + 1e-9))
            # 64px leaves a 2x2 final map, so the accepted 1-ulp tie
            # flips carry ~12x the relative weight of the 224px tight
            # test above (which pins < 0.03 on the same code path)
            assert rel < 0.06, (cap, rel)
            # the cap must actually be exercised, not vacuously pass via
            # f32 materialization: pairs form AND the int8 fast path runs
            assert deploy.pair_stats["formed"] > 0, cap
            assert deploy.pair_stats["consumed_fast"] > 0, cap
            formed[cap] = dict(deploy.pair_stats)
        # SSQ_PAIR_TERMS<2 is the documented off switch (alias for
        # SSQ_PAIR_TRANSPORT=0): no pairs may form at all
        monkeypatch.setenv("SSQ_PAIR_TERMS", "0")
        dep0 = deploy.deploy_forward(graph, dparams, steps, x, plan=plan)
        assert deploy.pair_stats["formed"] == 0
        rel0 = float(jnp.abs(sim - dep0).mean()
                     / (jnp.abs(sim).mean() + 1e-9))
        assert rel0 < 0.06, rel0
        # cap differentiation needs chains deeper than 2, which requires
        # code-form (4-bit) unit sites: W4A8's 8-bit zp=0 sites travel as
        # 'biased', which never join pairs — so check trace shape at W2A4
        cfg2 = ssq.QuantConfig(n_bits_w=2, n_bits_a=4,
                               w_scale_method="max", a_scale_method="max")
        params2, qstate2 = ssq.prepare_model(graph, raw, cfg2)
        qstate2 = ssq.calibrate_acts(graph, params2, qstate2, x, cfg2)
        dparams2 = deploy.build_deploy_params(graph, params2, qstate2)
        steps2 = deploy.act_steps_from_qstate(graph, qstate2)
        plan2 = deploy.make_deploy_plan(graph, dparams2, steps2,
                                        input_hw=(64, 64))
        counts = {}
        for cap in ("2", "3"):
            monkeypatch.setenv("SSQ_PAIR_TERMS", cap)
            deploy.deploy_forward(graph, dparams2, steps2, x, plan=plan2)
            counts[cap] = dict(deploy.pair_stats)
        # a deeper cap lets later blocks in a 3+-deep stage keep deferring
        # instead of materializing f32: strictly more pairs must form
        assert counts["3"]["formed"] > counts["2"]["formed"], counts


class TestResidualChainHarmonization:
    """quantize.harmonize_residual_chains: siteless residual chains share
    one act step, so the residual add is an exact int8 code add and every
    chain consumer runs a single int8 conv (deploy._chain_sum_sites)."""

    def _chain_graph(self):
        """An isolated 3-deep siteless inverted-residual chain (the
        MNASNet stage shape, models/mnasnet.py) with a linear head."""
        from shiftedscalequantization_tpu.graph import OpSpec
        from shiftedscalequantization_tpu.models.mnasnet import \
            _inverted_residual
        from shiftedscalequantization_tpu.models.mnasnet import _conv
        nodes = [_conv("model.pre", 3, 16, 3, 1, 1, act="relu")]
        nodes.append(_inverted_residual("model.s.0", 16, 16, 3, 1, 3))
        nodes.append(_inverted_residual("model.s.1", 16, 16, 3, 1, 3))
        nodes.append(_inverted_residual("model.s.2", 16, 16, 3, 1, 3))
        nodes.append(OpSpec("model.gap", "gap"))
        from shiftedscalequantization_tpu.graph import UnitSpec
        nodes.append(UnitSpec("model.fc", "linear", in_ch=16, out_ch=10))
        return tuple(nodes)

    def test_chain_exactness_and_plan(self):
        from shiftedscalequantization_tpu.quantize import \
            harmonize_residual_chains
        graph = self._chain_graph()
        raw = resnet.init_params(jax.random.PRNGKey(3), graph)
        cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=4, w_scale_method="max",
                              a_scale_method="max",
                              use_8bit_head_stem=False)
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 16, 16, 3))
        qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
        qstate, ratios = harmonize_residual_chains(graph, qstate)
        # one chain: opener proj + 2 residual projs (the first block here
        # is itself residual, so its entry — the pre conv site — joins)
        assert len(ratios) >= 3, ratios
        assert max(ratios.values()) >= 1.0
        # member deltas now identical
        deltas = {n: float(np.asarray(qstate[n].aq.delta))
                  for n in ratios}
        assert len(set(deltas.values())) == 1, deltas

        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        sums = deploy._chain_sum_sites(graph, steps)
        assert len(sums) == 3, sums          # one per residual block
        plan = deploy.make_deploy_plan(graph, dparams, steps,
                                       input_hw=(16, 16))
        # chain consumers must not run the float path
        for blk in ("model.s.1", "model.s.2"):
            kind = plan[f"{blk}.layers.0"][0]
            assert not kind.startswith("float"), (blk, kind)
        flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
        sim = ssq.forward(graph, params, qstate, x, flags)
        dep = deploy.deploy_forward(graph, dparams, steps, x, plan)
        # isolated chain, no 8-bit head/stem: every transport is exact, so
        # sim == deploy up to ~1-ulp multiplier association
        rel = float(jnp.abs(sim - dep).max() / (jnp.abs(sim).max() + 1e-9))
        assert rel < 1e-3, rel

    def test_harmonization_noop_without_equal_deltas(self):
        """Un-harmonized qstate: no sum sites form, plan unchanged."""
        from shiftedscalequantization_tpu.models import zoo
        graph = self._chain_graph()
        raw = resnet.init_params(jax.random.PRNGKey(3), graph)
        cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=4, w_scale_method="max",
                              a_scale_method="max",
                              use_8bit_head_stem=False)
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 16, 16, 3))
        qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        assert deploy._chain_sum_sites(graph, steps) == {}


class TestMobileNetV2Deploy:
    """Full-graph deploy==sim on the MNV2 cifar variant: exercises the
    bf16_codes thin-unit path (every depthwise conv), biased 8-bit stem
    transport, and block-site residual fusing — the plan mix whose TPU
    lowering broke in round 3 (round4_logs/NOTES_deploy_nan.md)."""

    def test_w4a8_matches_sim(self):
        from shiftedscalequantization_tpu.models import resnet, zoo
        graph, _ = zoo.build("mobilenetv2", dataset="synth10")
        raw = resnet.init_params(jax.random.PRNGKey(0), graph)
        cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=8,
                              w_scale_method="max", a_scale_method="max")
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
        qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
        flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
        sim = np.asarray(ssq.forward(graph, params, qstate, x, flags))
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps,
                                       input_hw=(32, 32))
        kinds = {v[0] for k, v in plan.items()
                 if isinstance(v, tuple) and len(v) == 2}
        assert "bf16_codes" in kinds, kinds   # the thin path must engage
        dep = np.asarray(deploy.deploy_forward(graph, dparams, steps, x,
                                               plan))
        # random-weight 17-block chaos amplifies per-site rounding-order
        # epsilons ~1.3x/node (the same accepted class as test_deploy's
        # W4A4 row); the meaningful contract is argmax agreement plus a
        # bounded mean drift (trained-state parity is exact to 0.1% —
        # debug_precision.py / ACCURACY_mnv2 rows)
        rel = np.abs(sim - dep).mean() / (np.abs(sim).mean() + 1e-9)
        assert rel < 0.15, rel
        assert (sim.argmax(-1) == dep.argmax(-1)).all()


class TestHarmonizeSurvivesRecalibration:
    def test_reharmonize_after_recalibrate(self):
        """Act re-calibration (the cli post-recon step) replaces every
        QParams and silently splits harmonized chains (round-3
        harm_accuracy shipped with sum_sites=0); re-harmonizing must
        restore equal member deltas and the deploy sum-site."""
        from shiftedscalequantization_tpu.quantize import \
            harmonize_residual_chains
        t = TestResidualChainHarmonization()
        graph = t._chain_graph()
        raw = resnet.init_params(jax.random.PRNGKey(3), graph)
        cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=4, w_scale_method="max",
                              a_scale_method="max",
                              use_8bit_head_stem=False)
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (4, 16, 16, 3))
        qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
        qstate, ratios = harmonize_residual_chains(graph, qstate)
        assert len(ratios) >= 3

        def member_deltas(qs):
            return [float(np.asarray(qs[n].aq.delta)) for n in ratios]

        # re-calibration (cli.py post-recon) destroys the shared step
        qstate2 = ssq.calibrate_acts(graph, params, qstate, x, cfg)
        assert len(set(member_deltas(qstate2))) > 1
        steps2 = deploy.act_steps_from_qstate(graph, qstate2)
        dp2 = deploy.build_deploy_params(graph, params, qstate2)
        plan2 = deploy.make_deploy_plan(graph, dp2, steps2,
                                        input_hw=(16, 16))
        assert len(plan2["__sum_steps__"]) == 0

        # re-harmonizing restores it
        qstate3, _ = harmonize_residual_chains(graph, qstate2)
        assert len(set(member_deltas(qstate3))) == 1
        steps3 = deploy.act_steps_from_qstate(graph, qstate3)
        dp3 = deploy.build_deploy_params(graph, params, qstate3)
        plan3 = deploy.make_deploy_plan(graph, dp3, steps3,
                                        input_hw=(16, 16))
        assert len(plan3["__sum_steps__"]) >= 1
