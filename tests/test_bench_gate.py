"""The bench parity gate must ENFORCE, not just report (VERDICT r4 weak #2).

Runs bench.py as a subprocess on the local CPU backend with the
SSQ_FAULT_GROUPED_CAST=nan fault hook (deploy._bf16_codes_cast), which
emulates the round-3 XLA:TPU grouped-conv miscompile (NaN accumulators,
round4_logs/NOTES_deploy_nan.md) on any platform: the bench must exit
NONZERO with an "error" field instead of printing a healthy number.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(os.environ)
    env.update({
        "BENCH_PLATFORM": "cpu",
        "BENCH_ARCH": "mobilenetv2",   # grouped convs hit the cast path
        "BENCH_BATCH": "4",
        "BENCH_ITERS": "1",
        "BENCH_HW": "32",
        "BENCH_PING_TIMEOUT": "120",
        "BENCH_PING_RETRIES": "1",
    })
    env.update(extra_env)
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=1200,
                       cwd=REPO, env=env)
    line = [l for l in p.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return p.returncode, json.loads(line)


@pytest.mark.slow
def test_injected_fault_fails_bench():
    rc, out = _run_bench({"SSQ_FAULT_GROUPED_CAST": "nan"})
    assert rc != 0, f"bench must exit nonzero on parity failure: {out}"
    assert "error" in out["extra"], out
    assert "parity gate FAILED" in out["extra"]["error"]
    assert out["value"] == 0 and out["vs_baseline"] == 0


@pytest.mark.slow
def test_clean_run_passes_gate():
    rc, out = _run_bench({})
    assert rc == 0, out
    assert "error" not in out["extra"], out
    assert out["value"] > 0
    assert out["extra"]["deploy_sim_logit_rel_mse"] <= 1e-2
