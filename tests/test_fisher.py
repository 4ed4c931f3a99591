"""Fisher-weighted reconstruction: grad capture + loss forms."""
import numpy as np
import jax
import jax.numpy as jnp

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu.graph import Flags, forward, forward_from, \
    prefix_flags_till
from shiftedscalequantization_tpu.models import resnet
from shiftedscalequantization_tpu.recon import ReconSettings, capture_io, \
    reconstruct_node
from shiftedscalequantization_tpu.recon.capture import capture_grads


def setup():
    graph = resnet.build_resnet(18, num_classes=10, variant="cifar")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4, w_scale_method="max",
                          use_8bit_head_stem=False)
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    cali = jax.random.normal(jax.random.PRNGKey(1), (64, 16, 16, 3))
    return graph, params, qstate, cali


class TestForwardFrom:
    def test_resume_equals_full(self):
        graph, params, qstate, cali = setup()
        name = "model.layer2.0"
        flags = Flags().all_weights(graph)
        full = forward(graph, params, qstate, cali[:8], flags)
        _, t = forward(graph, params, qstate, cali[:8], flags, capture=name)
        resumed = forward_from(graph, params, qstate, name, t, flags)
        np.testing.assert_allclose(np.asarray(resumed), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)

    def test_prefix_flags_till(self):
        graph, params, qstate, cali = setup()
        f = prefix_flags_till(graph, "model.layer1.1")
        assert "model.conv1" in f.weight_on
        assert "model.layer1.1.conv2" in f.weight_on
        assert "model.layer2.0.conv1" not in f.weight_on


class TestGradCapture:
    def test_shapes_and_floor(self):
        graph, params, qstate, cali = setup()
        g = capture_grads(graph, params, qstate, "model.layer1.0", cali,
                          batch_size=32)
        assert g.shape == (64, 16, 16, 64)
        assert float(g.min()) >= 1.0  # |grad| + 1 damping
        assert float(g.max()) > 1.0   # some signal

    def test_fp_prefix_gives_zero_signal(self):
        """If the net were FP everywhere, KL would be 0 and grads ~0
        (sanity of the quantize-till wiring: grads must reflect quant)."""
        graph, params, qstate, cali = setup()
        g = capture_grads(graph, params, qstate, "model.layer4.1", cali[:32],
                          batch_size=32)
        assert float((g - 1.0).max()) >= 0.0


class TestFisherRecon:
    def test_fisher_diag_runs_and_improves(self):
        graph, params, qstate, cali = setup()
        name = "model.layer1.0"
        cin, cout = capture_io(graph, params, qstate, name, cali,
                               Flags(), Flags(), 32)
        grads = capture_grads(graph, params, qstate, name, cali, 32)
        s = ReconSettings(mode="fused", iters=40, batch_size=16,
                          rec_loss="fisher_diag", opt_beta=True,
                          shift_targets=(1 - 1 / 32, 1 + 1 / 32, 1.0))
        qs2, m = reconstruct_node(graph, params, qstate, name, cin, cout,
                                  s, jax.random.PRNGKey(3), cached_grads=grads)
        tr = np.asarray(m["rec_trace"])
        assert np.isfinite(tr).all()
        assert tr[-10:].mean() <= tr[:5].mean() * 1.5

    def test_fisher_full_runs(self):
        graph, params, qstate, cali = setup()
        name = "model.fc"
        cin, cout = capture_io(graph, params, qstate, name, cali,
                               Flags(), Flags(), 32)
        s = ReconSettings(mode="brecq", iters=20, batch_size=16,
                          rec_loss="fisher_full")
        grads = jnp.abs(jax.random.normal(jax.random.PRNGKey(9),
                                          cout.shape)) + 1.0
        qs2, m = reconstruct_node(graph, params, qstate, name, cin, cout,
                                  s, jax.random.PRNGKey(4),
                                  cached_grads=grads)
        assert np.isfinite(np.asarray(m["rec_trace"])).all()


class TestNestedTargetGrads:
    def test_grad_capture_inside_block(self):
        """Per-unit targets nested in blocks (MNASNet-style) must work via
        the injected forward (reported crash: forward_from KeyError)."""
        graph, params, qstate, cali = setup()
        g = capture_grads(graph, params, qstate, "model.layer1.0.conv1",
                          cali[:32], batch_size=32)
        assert g.shape[0] == 32 and float(g.min()) >= 1.0

    def test_inject_matches_forward(self):
        from shiftedscalequantization_tpu.graph import forward_inject
        graph, params, qstate, cali = setup()
        flags = Flags().all_weights(graph)
        name = "model.layer2.0.conv1"
        _, t = forward(graph, params, qstate, cali[:4], flags, capture=name)
        full = forward(graph, params, qstate, cali[:4], flags)
        injected = forward_inject(graph, params, qstate, cali[:4], name, t,
                                  flags)
        np.testing.assert_allclose(np.asarray(injected), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)

    def test_prefix_flags_till_nested(self):
        graph, params, qstate, cali = setup()
        f = prefix_flags_till(graph, "model.layer1.0.conv1")
        assert "model.layer1.0.conv1" in f.weight_on
        assert "model.layer1.0.conv2" not in f.weight_on
