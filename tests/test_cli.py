"""CLI driver smoke tests (tiny iters, synthetic data)."""
import os

import numpy as np
import pytest

from shiftedscalequantization_tpu.cli import main

COMMON = ["--dataset", "cifar10", "--arch", "resnet18",
          "--num_samples", "64", "--batch_size", "32",
          "--w_scale_method", "max", "--a_scale_method", "max",
          "--skip_test", "true"]


def run(tmp_path, extra):
    return main(COMMON + ["--checkpoint_dir", str(tmp_path / "ck"),
                          "--log_path", str(tmp_path / "run.log")] + extra)


@pytest.mark.slow
class TestPipelines:
    def test_fused(self, tmp_path):
        acc = run(tmp_path, ["--mode", "fused", "--iters_w", "4"])
        assert 0 <= acc["top1"] <= 100
        assert os.path.exists(tmp_path / "run.log")

    def test_fused_auto_candidates_and_bias_cal(self, tmp_path):
        acc = run(tmp_path, ["--mode", "fused", "--iters_w", "4",
                             "--auto_candidates", "true",
                             "--bias_cal", "true", "--opt_beta", "true"])
        assert 0 <= acc["top1"] <= 100

    def test_brecq_with_act_phase(self, tmp_path):
        acc = run(tmp_path, ["--mode", "brecq", "--iters_w", "4",
                             "--iters_a", "4"])
        assert 0 <= acc["top1"] <= 100

    def test_two_phase(self, tmp_path):
        acc = run(tmp_path, ["--mode", "two_phase", "--iters_w", "4",
                             "--shift_targets", "0.5,1.0"])
        assert 0 <= acc["top1"] <= 100

    def test_mse_mode(self, tmp_path):
        acc = run(tmp_path, ["--mode", "mse", "--mse_level", "2"])
        assert 0 <= acc["top1"] <= 100

    def test_golden_logit_roundtrip(self, tmp_path):
        g = str(tmp_path / "golden")
        run(tmp_path, ["--mode", "mse", "--golden_dir", g])
        assert os.path.exists(f"{g}/result_2bit.npz")
        # second run compares and MSE vs itself is ~0
        run(tmp_path, ["--mode", "mse", "--golden_dir", g])


@pytest.mark.slow
class TestCheckpointFlow:
    def test_make_then_resume_then_eval(self, tmp_path):
        r = run(tmp_path, ["--make_checkpoint", "true"])
        assert r is None
        a1 = run(tmp_path, ["--mode", "fused", "--iters_w", "4"])
        a2 = run(tmp_path, ["--mode", "fused", "--iters_w", "4",
                            "--resume", "true"])
        a3 = run(tmp_path, ["--eval_only", "true"])
        assert a1 == a2 == a3

    def test_fused_with_act_shift_phase(self, tmp_path):
        acc = run(tmp_path, ["--mode", "fused", "--iters_w", "4",
                             "--iters_a", "4", "--act_mode", "shift"])
        assert 0 <= acc["top1"] <= 100


@pytest.mark.slow
class TestDeterminism:
    def test_same_seed_identical_results(self, tmp_path):
        """Seeded end-to-end reproducibility (the reference's seed_all role,
        common.py:77-85): two identical runs give identical accuracy and
        identical checkpointed quantizer state."""
        import numpy as np
        from shiftedscalequantization_tpu.utils import checkpoint as ck
        a1 = main(COMMON + ["--checkpoint_dir", str(tmp_path / "a"),
                            "--log_path", str(tmp_path / "a.log"),
                            "--mode", "fused", "--iters_w", "6"])
        a2 = main(COMMON + ["--checkpoint_dir", str(tmp_path / "b"),
                            "--log_path", str(tmp_path / "b.log"),
                            "--mode", "fused", "--iters_w", "6"])
        assert a1 == a2
        q1, _ = ck.load_qstate(str(tmp_path / "a" / "QNN_W2_A4"))
        q2, _ = ck.load_qstate(str(tmp_path / "b" / "QNN_W2_A4"))
        w1 = np.asarray(q1["model.layer2.0.conv1"].wq.alpha)
        w2 = np.asarray(q2["model.layer2.0.conv1"].wq.alpha)
        np.testing.assert_array_equal(w1, w2)
