"""Reconstruction engine tests on a tiny model (fast shapes, few iters)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu.graph import BlockSpec, Flags, OpSpec, UnitSpec
from shiftedscalequantization_tpu.models import resnet
from shiftedscalequantization_tpu.ops import wquant as W
from shiftedscalequantization_tpu.recon import (ReconSettings, capture_io,
                                                reconstruct_model,
                                                reconstruct_node)


def tiny_graph():
    conv1 = UnitSpec("model.conv1", "conv", 3, 8, kernel=(3, 3), stride=(1, 1),
                     padding=(1, 1), activation="relu", has_bn=True)
    block = BlockSpec(
        "model.layer1.0",
        units=(
            UnitSpec("model.layer1.0.conv1", "conv", 8, 8, kernel=(3, 3),
                     padding=(1, 1), activation="relu", has_bn=True),
            UnitSpec("model.layer1.0.conv2", "conv", 8, 8, kernel=(3, 3),
                     padding=(1, 1), disable_act_quant=True, has_bn=True),
        ),
        residual=True, post_activation="relu")
    return (conv1, block, OpSpec("model.avgpool", "gap"),
            UnitSpec("model.fc", "linear", 8, 4))


@pytest.fixture(scope="module")
def setup():
    graph = tiny_graph()
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max",
                          use_8bit_head_stem=False)
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    cali = jax.random.normal(jax.random.PRNGKey(1), (64, 8, 8, 3))
    return graph, params, qstate, cali, cfg


def _capture(graph, params, qstate, name, cali, prefix=Flags()):
    return capture_io(graph, params, qstate, name, cali,
                      inp_flags=prefix, out_flags=Flags(), batch_size=32)


class TestCapture:
    def test_shapes_and_fp_targets(self, setup):
        graph, params, qstate, cali, _ = setup
        cin, cout = _capture(graph, params, qstate, "model.layer1.0", cali)
        assert cin.shape == (64, 8, 8, 8)
        assert cout.shape == (64, 8, 8, 8)

    def test_asym_prefix_changes_inputs(self, setup):
        graph, params, qstate, cali, _ = setup
        fp_in, _ = _capture(graph, params, qstate, "model.layer1.0", cali)
        q_in, _ = _capture(graph, params, qstate, "model.layer1.0", cali,
                           prefix=Flags(weight_on=frozenset({"model.conv1"})))
        assert float(jnp.abs(fp_in - q_in).max()) > 0  # W2 prefix quant visible

    def test_remainder_batch_not_dropped(self, setup):
        """N % batch_size != 0 must capture ALL samples (round-1 review:
        the old floor division silently dropped the remainder)."""
        graph, params, qstate, cali, _ = setup
        for n in (50, 20):  # 50 = 1 full + remainder; 20 < batch_size
            cin, cout = capture_io(graph, params, qstate, "model.layer1.0",
                                   cali[:n], inp_flags=Flags(),
                                   out_flags=Flags(), batch_size=32)
            assert cin.shape[0] == n and cout.shape[0] == n
            full, _ = _capture(graph, params, qstate, "model.layer1.0", cali)
            np.testing.assert_allclose(np.asarray(cin), np.asarray(full[:n]),
                                       rtol=1e-6)

    def test_session_remainder_matches_capture_io(self, setup):
        from shiftedscalequantization_tpu.recon.capture import CaptureSession
        graph, params, qstate, cali, _ = setup
        sess = CaptureSession(graph, params, cali[:50], ("model.layer1.0",),
                              batch_size=32)
        si, so = sess.capture(qstate, "model.layer1.0", [])
        ri, ro = capture_io(graph, params, qstate, "model.layer1.0",
                            cali[:50], inp_flags=Flags(), out_flags=Flags(),
                            batch_size=32)
        assert si.shape[0] == 50
        np.testing.assert_allclose(np.asarray(si), np.asarray(ri), atol=1e-6)
        np.testing.assert_allclose(np.asarray(so), np.asarray(ro), atol=1e-6)


class TestFusedRecon:
    def test_block_recon_improves(self, setup):
        graph, params, qstate, cali, _ = setup
        name = "model.layer1.0"
        cin, cout = _capture(graph, params, qstate, name, cali)
        # fused-path targets must be near 1.0 (the reference's snapshot
        # default, ShiftedScaleQuant.py:388): dequant stays at base delta,
        # so aggressive targets like 0.5 are catastrophic here by design.
        s = ReconSettings(mode="fused", iters=150, batch_size=16,
                          shift_targets=(1 - 1 / 32, 1 + 1 / 32, 1.0),
                          opt_beta=True)
        # loss of plain-uniform W2 quant before recon
        units = ["model.layer1.0.conv1", "model.layer1.0.conv2"]
        from shiftedscalequantization_tpu.graph import apply_node, find_node
        from shiftedscalequantization_tpu.recon.engine import lp_loss_cl
        pre = apply_node(find_node(graph, name), params, qstate, cin[:16],
                         Flags(weight_on=frozenset(units)))
        pre_loss = float(lp_loss_cl(pre, cout[:16], 2.0))

        qs2, metrics = reconstruct_node(graph, params, qstate, name,
                                        cin, cout, s, jax.random.PRNGKey(2))
        assert float(metrics["hard_loss"]) < pre_loss
        # selection ratios are normalized per unit
        for u, r in metrics["selection_ratio"].items():
            if isinstance(r, str):   # 'skipped:high-bit' marker
                continue
            np.testing.assert_allclose(np.asarray(r).sum(), 1.0, atol=1e-6)
        # hardened quantizer is a hard ShiftedScaleWQ
        wq = qs2[units[0]].wq
        assert isinstance(wq, W.ShiftedScaleWQ)
        assert wq.hard_targets and wq.hard_round

    def test_rec_trace_decreases(self, setup):
        graph, params, qstate, cali, _ = setup
        name = "model.fc"
        cin, cout = _capture(graph, params, qstate, name, cali)
        s = ReconSettings(mode="fused", iters=200, batch_size=16,
                          shift_targets=(1 - 1 / 32, 1 + 1 / 32, 1.0))
        _, metrics = reconstruct_node(graph, params, qstate, name,
                                      cin, cout, s, jax.random.PRNGKey(3))
        tr = np.asarray(metrics["rec_trace"])
        assert tr[-20:].mean() <= tr[:20].mean()


class TestBrecqRecon:
    def test_layer_adaround(self, setup):
        graph, params, qstate, cali, _ = setup
        name = "model.fc"
        cin, cout = _capture(graph, params, qstate, name, cali)
        s = ReconSettings(mode="brecq", iters=150, batch_size=16)
        qs2, metrics = reconstruct_node(graph, params, qstate, name,
                                        cin, cout, s, jax.random.PRNGKey(4))
        wq = qs2[name].wq
        assert isinstance(wq, W.AdaRoundWQ) and not wq.soft
        # hard output lies on the quant grid
        w_hat = np.asarray(wq(params[name]["w"]))
        delta = np.asarray(wq.qp.delta)
        codes = w_hat / delta
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)


class TestTwoPhase:
    def test_shift_then_round(self, setup):
        # two-phase path: dequant at delta*st, so aggressive targets (0.5)
        # are legitimate here (channelQuant.py init_v:201-213)
        graph, params, qstate, cali, _ = setup
        name = "model.fc"
        cin, cout = _capture(graph, params, qstate, name, cali)
        s1 = ReconSettings(mode="shift", iters=80, batch_size=16,
                           shift_targets=(0.5, 1.0), lmda_s=0.01)
        qs2, m1 = reconstruct_node(graph, params, qstate, name,
                                   cin, cout, s1, jax.random.PRNGKey(5))
        wq = qs2[name].wq
        assert isinstance(wq, W.ShiftedScaleWQ) and not wq.codes
        assert wq.hard_targets
        s2 = ReconSettings(mode="round", iters=80, batch_size=16)
        qs3, m2 = reconstruct_node(graph, params, qs2, name,
                                   cin, cout, s2, jax.random.PRNGKey(6))
        wq2 = qs3[name].wq
        assert isinstance(wq2, W.AdaRoundWQ) and not wq2.soft
        # baked shifts kept factorized: per-pair st_index over candidates
        assert wq2.st_index is not None
        assert wq2.st_index.shape == params[name]["w"].shape  # linear (OC,IC)
        assert wq2.shift_targets == (0.5, 1.0)
        # effective delta is per-pair
        d_eff = wq2._delta(params[name]["w"])
        assert d_eff.shape == params[name]["w"].shape


class TestPipeline:
    def test_sequential_prefix(self, setup):
        graph, params, qstate, cali, _ = setup
        s = ReconSettings(mode="fused", iters=40, batch_size=16,
                          shift_targets=(0.5, 1.0))
        s = dataclasses.replace(s, shift_targets=(1 - 1 / 32, 1 + 1 / 32, 1.0))
        seen = []
        qs2, hist, prefix = reconstruct_model(
            graph, params, qstate, ["model.layer1.0", "model.fc"], cali, s,
            jax.random.PRNGKey(7), batch_size=32,
            on_node_done=lambda n, qs, m, f: seen.append((n, set(f.weight_on))))
        assert [n for n, _ in seen] == ["model.layer1.0", "model.fc"]
        # prefix accumulates: after fc, all three recon'd units are on
        assert seen[1][1] >= {"model.layer1.0.conv1", "model.layer1.0.conv2",
                              "model.fc"}
        assert set(hist.keys()) == {"model.layer1.0", "model.fc"}


class TestCaptureSession:
    def test_matches_capture_io_across_prefixes(self, setup):
        """The single-graph session must reproduce capture_io exactly for
        empty and non-empty quantized prefixes, including a hardened
        (structure-changed) quantizer in the prefix."""
        import jax.numpy as jnp
        from shiftedscalequantization_tpu.recon.capture import CaptureSession
        from shiftedscalequantization_tpu.ops import wquant as W
        graph, params, qstate, cali, _ = setup
        targets = ["model.layer1.0", "model.fc"]
        sess = CaptureSession(graph, params, cali, targets, batch_size=32)

        # empty prefix
        ci, co = sess.capture(qstate, "model.layer1.0", frozenset())
        ri, ro = capture_io(graph, params, qstate, "model.layer1.0", cali,
                            Flags(), Flags(), 32)
        np.testing.assert_allclose(np.asarray(ci), np.asarray(ri), atol=1e-6)
        np.testing.assert_allclose(np.asarray(co), np.asarray(ro), atol=1e-6)

        # prefix with a HARDENED shifted-scale quantizer (different pytree)
        qs2 = dict(qstate)
        name = "model.conv1"
        wq = W.init_shifted_scale(qs2[name].wq.qp, params[name]["w"],
                                  (1 - 1 / 32, 1 + 1 / 32, 1.0))
        wq = dataclasses.replace(wq, hard_targets=True, hard_round=True)
        qs2[name] = dataclasses.replace(qs2[name], wq=wq)
        prefix = frozenset({name})
        ci2, co2 = sess.capture(qs2, "model.fc", prefix)
        ri2, ro2 = capture_io(graph, params, qs2, "model.fc", cali,
                              Flags(weight_on=prefix), Flags(), 32)
        np.testing.assert_allclose(np.asarray(ci2), np.asarray(ri2),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(co2), np.asarray(ro2),
                                   atol=1e-6)

    def test_pipeline_with_session_matches_without(self, setup):
        graph, params, qstate, cali, _ = setup
        s = ReconSettings(mode="fused", iters=20, batch_size=16,
                          shift_targets=(1 - 1 / 32, 1 + 1 / 32, 1.0))
        qa, ha, _ = reconstruct_model(
            graph, params, qstate, ["model.layer1.0", "model.fc"], cali, s,
            jax.random.PRNGKey(7), batch_size=32)
        qb, hb, _ = reconstruct_model(
            graph, params, qstate, ["model.layer1.0", "model.fc"], cali, s,
            jax.random.PRNGKey(7), batch_size=32, single_graph_capture=True)
        np.testing.assert_allclose(
            np.asarray(qa["model.fc"].wq.alpha),
            np.asarray(qb["model.fc"].wq.alpha), rtol=1e-4, atol=1e-5)


class TestOtherFamilies:
    def test_grouped_conv_block_recon(self):
        """RegNetX-style grouped 3x3 conv inside a block reconstructs."""
        from shiftedscalequantization_tpu.models import regnet
        g = regnet.build_regnetx("regnetx_200m", num_classes=10)
        # take the first block only, on small inputs
        raw = resnet.init_params(jax.random.PRNGKey(0), g)
        cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max",
                              use_8bit_head_stem=False)
        params, qstate = ssq.prepare_model(g, raw, cfg)
        cali = jax.random.normal(jax.random.PRNGKey(1), (32, 16, 16, 3))
        name = g[1].name  # first ResBottleneckBlock
        assert g[1].units[1].groups > 1  # grouped conv present
        cin, cout = capture_io(g, params, qstate, name, cali,
                               Flags(), Flags(), 16)
        s = ReconSettings(mode="fused", iters=15, batch_size=8,
                          shift_targets=(1 - 1 / 32, 1 + 1 / 32, 1.0),
                          opt_beta=True)
        qs2, m = reconstruct_node(g, params, qstate, name, cin, cout, s,
                                  jax.random.PRNGKey(2))
        assert np.isfinite(float(m["hard_loss"]))

    def test_depthwise_block_recon(self):
        """MobileNetV2 inverted-residual (depthwise conv) reconstructs."""
        from shiftedscalequantization_tpu.models import mobilenetv2
        g = mobilenetv2.build_mobilenetv2(num_classes=10)
        raw = resnet.init_params(jax.random.PRNGKey(0), g)
        cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=4, w_scale_method="max",
                              use_8bit_head_stem=False)
        params, qstate = ssq.prepare_model(g, raw, cfg)
        cali = jax.random.normal(jax.random.PRNGKey(1), (32, 32, 32, 3))
        name = "model.features.1"   # expand_ratio=1: dw + pw-linear
        cin, cout = capture_io(g, params, qstate, name, cali,
                               Flags(), Flags(), 16)
        s = ReconSettings(mode="fused", iters=15, batch_size=8,
                          shift_targets=(1 - 1 / 32, 1 + 1 / 32, 1.0))
        qs2, m = reconstruct_node(g, params, qstate, name, cin, cout, s,
                                  jax.random.PRNGKey(2))
        assert np.isfinite(float(m["hard_loss"]))
        # depthwise unit got a shifted-scale quantizer with per-IC alpha
        dw = qs2["model.features.1.conv.0"].wq
        assert isinstance(dw, W.ShiftedScaleWQ)


class TestFusedWarmstart:
    def test_warmstart_repairs_planted_imbalance(self):
        """Regression for the fused-joint mis-assignment collapse
        (VERDICT r4 weak #1; x16 demo: fused 7.8% where two_phase gets
        99.4): plant a function-preserving 16x per-input-channel scale
        imbalance on a block's conv2 (the advantage_demo.py transform in
        miniature), then run fused effective-dequant recon with and
        without the shift-pre-solve warm start at the SAME total budget.
        The warm-started run must (a) end at a lower hard loss and (b)
        harden to a selection that tracks the planted pattern."""
        graph = tiny_graph()
        raw = resnet.init_params(jax.random.PRNGKey(0), graph)
        raw = {k: dict(v) if isinstance(v, dict) else v
               for k, v in raw.items()}
        # scale thirds of conv2's input channels by (1, 4, 16);
        # compensate in conv1's BN affine (positive-homogeneous relu
        # between them keeps the FP function unchanged)
        ic = 8
        s = np.ones(ic, np.float32)
        s[2:5] = 4.0
        s[5:] = 16.0
        blk = "model.layer1.0"
        c2 = dict(raw[f"{blk}.conv2"])
        c2["w"] = raw[f"{blk}.conv2"]["w"] * s[None, :, None, None]
        raw[f"{blk}.conv2"] = c2
        c1 = dict(raw[f"{blk}.conv1"])
        bn = dict(c1["bn"])
        bn["gamma"] = bn["gamma"] / s
        bn["beta"] = bn["beta"] / s
        c1["bn"] = bn
        raw[f"{blk}.conv1"] = c1

        cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max",
                              use_8bit_head_stem=False)
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        cali = jax.random.normal(jax.random.PRNGKey(1), (64, 8, 8, 3))
        cin, cout = _capture(graph, params, qstate, blk, cali)

        sts = (0.0625, 0.25, 1.0)
        base = dict(mode="fused", iters=80, batch_size=16,
                    shift_targets=sts, fused_dequant="effective",
                    opt_beta=True)
        key = jax.random.PRNGKey(2)
        qs_on, m_on = reconstruct_node(
            graph, params, qstate, blk, cin, cout,
            ReconSettings(**base, warmstart_frac=0.25), key)
        assert "warmstart" in m_on and m_on["warmstart"]["iters"] == 20
        assert np.isfinite(float(m_on["hard_loss"]))

        # THE mechanism under test (what the round-4 joint path lost):
        # the hardened st_index must be EXACTLY the shift pre-solve's
        # argmax — rounding was optimized against the selection that
        # ships, nothing decays through the joint phase or hardening.
        # Reproduce the pre-solve verbatim (same fold_in(key, 877)
        # derivation, same 25% iteration slice) and compare.
        s_ws = ReconSettings(**base, warmstart_frac=0.25)
        s_ws = dataclasses.replace(s_ws, mode="shift", iters=20)
        qs_ws, _ = reconstruct_node(graph, params, qstate, blk, cin, cout,
                                    s_ws, jax.random.fold_in(key, 877))
        for u in (f"{blk}.conv1", f"{blk}.conv2"):
            wq = qs_on[u].wq
            assert isinstance(wq, W.AdaRoundWQ) and wq.st_index is not None
            pre = np.asarray(jnp.argmax(qs_ws[u].wq.soft_targets(), -1))
            np.testing.assert_array_equal(np.asarray(wq.st_index), pre)
        # the planted pattern is recoverable from the hardened state:
        # channel scaled by s wants the candidate nearest s/smax
        # (advantage_demo.selection_vs_planted rule); the pre-solve on
        # this easy shallow fixture tracks it well above chance
        idx = np.asarray(qs_on[f"{blk}.conv2"].wq.st_index).reshape(-1)
        expect = np.argmin(
            np.abs(np.asarray(sts)[None, :] - (s / s.max())[:, None]), 1)
        match = float((idx == expect).mean())
        assert match >= 0.5, (idx.tolist(), expect.tolist(), match)


class TestHighBitShiftSkip:
    """8-bit units skip coarse shift-candidate selection (engine._skip_shift).

    With >= 256 weight levels there is no per-channel scale error for a
    candidate to repair; coarse candidates can only mis-assign (the
    two-phase x16 demo's 8-bit fc dropped 99.4 -> 73.8 top-1 from this).
    Reference-style near-1 sets keep the faithful ShiftedScaleWQ path."""

    def _setup8(self):
        graph = tiny_graph()
        raw = resnet.init_params(jax.random.PRNGKey(0), graph)
        cfg = ssq.QuantConfig(n_bits_w=8, n_bits_a=8, w_scale_method="max",
                              use_8bit_head_stem=False)
        params, qstate = ssq.prepare_model(graph, raw, cfg)
        cali = jax.random.normal(jax.random.PRNGKey(1), (32, 8, 8, 3))
        return graph, params, qstate, cali

    def test_two_phase_skips_selection_at_8bit(self):
        graph, params, qstate, cali = self._setup8()
        name = "model.fc"
        cin, cout = _capture(graph, params, qstate, name, cali)
        s1 = ReconSettings(mode="shift", iters=20, batch_size=16,
                           shift_targets=(0.0625, 0.25, 1.0), lmda_s=0.01)
        qs2, _ = reconstruct_node(graph, params, qstate, name, cin, cout,
                                  s1, jax.random.PRNGKey(5))
        wq = qs2[name].wq
        assert isinstance(wq, W.AdaRoundWQ)       # selection skipped
        s2 = ReconSettings(mode="round", iters=20, batch_size=16)
        qs3, m2 = reconstruct_node(graph, params, qs2, name, cin, cout,
                                   s2, jax.random.PRNGKey(6))
        wq2 = qs3[name].wq
        assert isinstance(wq2, W.AdaRoundWQ) and not wq2.soft
        assert wq2.st_index is None               # no baked selection
        assert np.isfinite(float(m2["hard_loss"]))

    def test_fused_skips_selection_at_8bit(self):
        graph, params, qstate, cali = self._setup8()
        name = "model.fc"
        cin, cout = _capture(graph, params, qstate, name, cali)
        s = ReconSettings(mode="fused", iters=20, batch_size=16,
                          shift_targets=(0.0625, 0.25, 1.0), opt_beta=True)
        qs2, m = reconstruct_node(graph, params, qstate, name, cin, cout,
                                  s, jax.random.PRNGKey(7))
        assert isinstance(qs2[name].wq, W.AdaRoundWQ)
        assert np.isfinite(float(m["hard_loss"]))

    def test_near_one_targets_keep_selection_at_8bit(self):
        graph, params, qstate, cali = self._setup8()
        name = "model.fc"
        cin, cout = _capture(graph, params, qstate, name, cali)
        s1 = ReconSettings(mode="shift", iters=10, batch_size=16,
                           shift_targets=(1 - 1 / 32, 1 + 1 / 32, 1.0),
                           lmda_s=0.01)
        qs2, _ = reconstruct_node(graph, params, qstate, name, cin, cout,
                                  s1, jax.random.PRNGKey(5))
        assert isinstance(qs2[name].wq, W.ShiftedScaleWQ)
