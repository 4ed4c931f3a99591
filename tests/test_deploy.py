"""Deploy (true-int) path must match sim (fake-quant) mode numerically."""
import numpy as np
import jax
import jax.numpy as jnp

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu import deploy
from shiftedscalequantization_tpu.models import resnet
from shiftedscalequantization_tpu.quantize import act_flags


def build(nbw=4, nba=4):
    graph = resnet.build_resnet(18, num_classes=10, variant="cifar")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=nbw, n_bits_a=nba, w_scale_method="max",
                          a_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    qstate = ssq.calibrate_acts(graph, params, qstate, x, cfg)
    flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
    return graph, params, qstate, x, flags


class TestDeployMatchesSim:
    def test_w4a4_logits_match(self):
        graph, params, qstate, x, flags = build(4, 4)
        sim = ssq.forward(graph, params, qstate, x, flags)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        dep = deploy.deploy_forward(graph, dparams, steps, x)
        sim, dep = np.asarray(sim), np.asarray(dep)
        # The deploy stem runs the 2-pass bf16 hi/lo split (exact-bf16
        # weight codes; ~2e-6 relative at the conv output). That flips
        # ~5e-5 of the 8-bit stem act codes by one step; through TEN
        # layers of 4-bit requantization on random weights the flips
        # amplify chaotically — the meaningful contract is top-1
        # agreement plus a bounded mean deviation. (At A8,
        # test_int_conv_exactness below, drift stays ~5e-3.)
        rel = np.abs(sim - dep).mean() / (np.abs(sim).mean() + 1e-9)
        assert rel < 0.15, rel
        # top-1 agreement
        assert (sim.argmax(-1) == dep.argmax(-1)).mean() >= 0.99

    def test_w2a4_int8_units_dominate(self):
        graph, params, qstate, x, flags = build(2, 4)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        n_int = sum(1 for d in dparams.values() if d.w_int is not None)
        n_bf16 = sum(1 for d in dparams.values() if d.w_int is None)
        assert n_int >= len(dparams) - 3   # only 8-bit head/tail fall back
        # int codes actually at W2: centered codes within +-3
        some = [d for n, d in dparams.items()
                if d.w_int is not None and "layer1" in n][0]
        assert int(jnp.abs(some.w_int).max()) <= 3

    def test_int_conv_exactness_single_unit(self):
        """For a mid-network int8 unit, deploy and sim unit outputs agree to
        float-epilogue precision when fed the same on-grid input."""
        graph, params, qstate, x, flags = build(4, 8)
        sim = ssq.forward(graph, params, qstate, x, flags)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        dep = deploy.deploy_forward(graph, dparams, steps, x)
        rel = float(jnp.abs(sim - dep).mean() / (jnp.abs(sim).mean() + 1e-9))
        assert rel < 0.02, rel


class TestS2dStem:
    def test_s2d_equals_direct_conv(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        w = jnp.asarray(rng.integers(-100, 100, (16, 3, 7, 7))
                        .astype(np.float32))
        from shiftedscalequantization_tpu.graph import conv2d
        direct = conv2d(x, w, None, (2, 2), (3, 3), 1)
        xs = deploy.space_to_depth(x)
        ws = deploy.s2d_kernel(w)
        s2d = jax.lax.conv_general_dilated(
            xs, jnp.transpose(ws, (2, 3, 1, 0)), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct),
                                   rtol=1e-5, atol=1e-3)

    def test_s2d_off_by_default(self):
        graph, params, qstate, x, flags = build(2, 4)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps)
        kinds = {v[0] for k, v in plan.items() if not k.startswith("__")}
        assert "float_s2d" not in kinds


class TestTwoPhaseDeploy:
    def test_baked_shift_grouped_int_deploy_matches_sim(self):
        """two-phase (shift -> bake -> adaround) hardened state deploys via
        the grouped scale-table epilogue and matches sim mode."""
        import dataclasses
        import jax.numpy as jnp
        from shiftedscalequantization_tpu.graph import Flags
        from shiftedscalequantization_tpu.recon import ReconSettings, \
            capture_io, reconstruct_node
        graph, params, qstate, x, flags = build(4, 4)
        cali = jax.random.normal(jax.random.PRNGKey(5), (64, 32, 32, 3))
        for name in ["model.layer1.0", "model.fc"]:
            cin, cout = capture_io(graph, params, qstate, name, cali,
                                   Flags(), Flags(), 32)
            qstate, _ = reconstruct_node(
                graph, params, qstate, name, cin, cout,
                ReconSettings(mode="shift", iters=10, batch_size=16,
                              shift_targets=(0.5, 1.0), lmda_s=0.01),
                jax.random.PRNGKey(6))
            qstate, _ = reconstruct_node(
                graph, params, qstate, name, cin, cout,
                ReconSettings(mode="round", iters=10, batch_size=16),
                jax.random.PRNGKey(7))
        sim = ssq.forward(graph, params, qstate, x, flags)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        # grouped form present on a conv unit
        assert dparams["model.layer1.0.conv1"].w_groups is not None
        assert dparams["model.layer1.0.conv1"].w_groups.shape[0] == 2
        steps = deploy.act_steps_from_qstate(graph, qstate)
        dep = deploy.deploy_forward(graph, dparams, steps, x)
        # weights are bit-exact (verified parity); residual deviation is
        # f32 summation-order epsilon plus the stem's 2-pass bf16 split
        # flipping 4-bit act codes at rounding boundaries (amplified
        # through the random-weight net — see test_w4a4_logits_match)
        rel = float(jnp.abs(sim - dep).mean() / (jnp.abs(sim).mean() + 1e-9))
        assert rel < 0.15, rel
        assert (jnp.argmax(sim, -1) == jnp.argmax(dep, -1)).mean() >= 0.95


class TestStem1Pass:
    def test_1pass_engages_and_matches_on_coarse_grids(self, monkeypatch):
        """Serving default (SSQ_STEM_1PASS=1): only the stem conv flips to
        'float_1p', and on the realistic coarse-grid config (max-calib
        W2A4, 8-bit stem site) the dropped x_lo pass leaves the final
        logits within quantization noise of the exact 2-pass split —
        measured bit-identical at 224px on the TPU (stem_drift_check.py).
        The conftest pins SSQ_STEM_1PASS=0 for every other test, so the
        exact split remains the tested spec."""
        graph, params, qstate, x, flags = build(2, 4)
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        monkeypatch.setenv("SSQ_STEM_1PASS", "1")
        p1 = deploy.make_deploy_plan(graph, dparams, steps)
        monkeypatch.setenv("SSQ_STEM_1PASS", "0")
        p0 = deploy.make_deploy_plan(graph, dparams, steps)
        diff = {k for k in p0 if p0[k] != p1[k]}
        assert diff == {"model.conv1"}, diff
        assert p1["model.conv1"][0] == "float_1p"
        d0 = np.asarray(deploy.deploy_forward(graph, dparams, steps, x,
                                              plan=p0))
        d1 = np.asarray(deploy.deploy_forward(graph, dparams, steps, x,
                                              plan=p1))
        # random-weight W2A4 logits are nearly degenerate, so single-step
        # code flips can move an argmax on this fixture; on the realistic
        # 224px config the two modes are bit-identical (trained-weight
        # top-1 equivalence is asserted in the ACCURACY pipeline).
        assert (d0.argmax(-1) == d1.argmax(-1)).mean() >= 0.75
        rel = np.abs(d0 - d1).mean() / (np.abs(d0).mean() + 1e-9)
        assert rel < 0.15, rel
