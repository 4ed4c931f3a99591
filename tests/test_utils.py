"""Profiling, analysis, logging, config utilities."""
import os

import numpy as np
import jax
import jax.numpy as jnp

import shiftedscalequantization_tpu as ssq
from shiftedscalequantization_tpu.models import resnet
from shiftedscalequantization_tpu.ops import quant as Q
from shiftedscalequantization_tpu.utils import analysis, profiling
from shiftedscalequantization_tpu.utils.config import load_args, \
    parse_shift_targets
from shiftedscalequantization_tpu.utils.logging import AverageMeter, RunLog


def small_model():
    graph = resnet.build_resnet(18, num_classes=10, variant="cifar")
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = ssq.QuantConfig(n_bits_w=4, n_bits_a=8, w_scale_method="max")
    params, qstate = ssq.prepare_model(graph, raw, cfg)
    return graph, params, qstate


class TestNumpyOracle:
    def test_matches_jax_mse_init(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=400).astype(np.float32)
        d_np, z_np, _ = analysis.numpy_mse_scale_init(x, 4)
        d_j, z_j, _ = Q.init_scale_mse(jnp.asarray(x), 4, False)
        np.testing.assert_allclose(float(d_j), d_np, rtol=1e-4)
        np.testing.assert_allclose(float(z_j), z_np)


class TestFlops:
    def test_resnet18_total(self):
        graph, params, qstate = small_model()
        total, per = profiling.graph_flops(graph, (32, 32), 1)
        # CIFAR ResNet-18 ~ 1.1 GFLOP (MAC*2) at 32x32
        assert 0.8e9 < total < 1.5e9, total
        assert per["model.layer1.0"] == per["model.layer1.1"]

    def test_conv_unit_flops(self):
        from shiftedscalequantization_tpu.graph import UnitSpec
        u = UnitSpec("u", "conv", 64, 128, kernel=(3, 3), stride=(2, 2),
                     padding=(1, 1))
        fl = profiling.unit_flops(u, (32, 32), 4)
        assert fl == 2 * 4 * 16 * 16 * 128 * 64 * 9


class TestLayerTiming:
    def test_runs_and_reports(self):
        graph, params, qstate = small_model()
        x = jnp.ones((4, 32, 32, 3))
        rows = profiling.layer_timing(graph, params, qstate, x, inner=2)
        names = [r["name"] for r in rows]
        assert "model.layer1.0" in names and "model.fc" in names
        table = profiling.format_timing(rows)
        assert "TOTAL" in table


class TestAnalysis:
    def test_channel_stats(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(16, 8, 3, 3)).astype(np.float32)
        st = analysis.weight_channel_stats(w)
        assert st["oc"] == 16 and st["absmax_ratio"] >= 1.0

    def test_plot_writes_png(self, tmp_path):
        graph, params, qstate = small_model()
        out = analysis.plot_weight_distributions(
            params, ["model.conv1", "model.fc"], str(tmp_path / "w.png"),
            qstate)
        assert os.path.getsize(out) > 1000

    def test_selection_summary_format(self):
        s = analysis.selection_summary({"layer1": [0.2, 0.3, 0.5]})
        assert "layer1" in s and "2:0.500" in s


class TestConfigAndLog:
    def test_defaults_match_reference(self):
        a = load_args([])
        assert a.n_bits_w == 2 and a.n_bits_a == 4
        assert a.iters_w == 20000 and a.iters_a == 5000
        assert a.num_samples == 1024 and a.warmup == 0.2
        assert a.b_start == 20 and a.b_end == 2
        assert parse_shift_targets(a.shift_targets) == (0.96875, 1.03125, 1.0)

    def test_runlog_appends(self, tmp_path):
        p = str(tmp_path / "run.log")
        log = RunLog(p)
        log.append("cfg", {"acc": 1.0})
        log.append("cfg", {"acc": 2.0})
        lines = open(p).read().strip().split("\n")
        assert len(lines) == 2 and "cfg" in lines[0]

    def test_average_meter(self):
        m = AverageMeter("t")
        m.update(1.0)
        m.update(3.0)
        assert m.avg == 2.0
