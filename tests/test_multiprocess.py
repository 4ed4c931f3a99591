"""TRUE multi-process jax.distributed test (round-1 review item 9).

Spawns two actual OS processes, each with 2 faked CPU devices, that rendez-
vous through jax.distributed.initialize (the TPU-native analog of the
reference's mp.spawn + dist.init_process_group('nccl', tcp://...),
Brecq/main_imagenet_dist.py:147-148,269-271) and run a sharded_validate
over a 4-device global mesh. Both processes must agree with each other AND
with a single-process ground-truth run.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from shiftedscalequantization_tpu.parallel.dist import init_multihost, \
    sharded_validate
from shiftedscalequantization_tpu.parallel.mesh import make_mesh
import tests.test_multiprocess as H

ok = init_multihost()
assert ok, "init_multihost must actually initialize in this test"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

graph, params, qstate, data = H.tiny_problem()
mesh = make_mesh(n_data=4, devices=jax.devices())
acc = sharded_validate(graph, params, qstate, data, mesh)
print("RESULT " + json.dumps({"pid": jax.process_index(), "acc": acc}),
      flush=True)
"""


def tiny_problem():
    """Deterministic tiny model + eval batches (identical in every
    process)."""
    import jax
    from shiftedscalequantization_tpu import QuantConfig, prepare_model
    from shiftedscalequantization_tpu.graph import OpSpec, UnitSpec
    from shiftedscalequantization_tpu.models import resnet

    graph = (
        UnitSpec("model.conv1", "conv", 3, 8, kernel=(3, 3), stride=(1, 1),
                 padding=(1, 1), activation="relu", has_bn=True),
        OpSpec("model.avgpool", "gap"),
        UnitSpec("model.fc", "linear", 8, 8),
    )
    raw = resnet.init_params(jax.random.PRNGKey(0), graph)
    cfg = QuantConfig(n_bits_w=4, w_scale_method="max",
                      use_8bit_head_stem=False)
    params, qstate = prepare_model(graph, raw, cfg)
    rng = np.random.default_rng(5)
    data = [(rng.normal(size=(10, 8, 8, 3)).astype(np.float32),
             rng.integers(0, 8, size=(10,)).astype(np.int32))
            for _ in range(3)]
    return graph, params, qstate, data


WORKER_DDP = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from shiftedscalequantization_tpu.parallel.dist import init_multihost
import tests.test_multiprocess as H

ok = init_multihost()
assert ok, "init_multihost must actually initialize in this test"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

res = H.ddp_recon_problem(jax.devices())
print("RESULT " + json.dumps({"pid": jax.process_index(), **res}),
      flush=True)
"""


def ddp_recon_problem(devices):
    """Deterministic DDP reconstruction over a 4-device mesh; returns
    hard_loss + an alpha checksum. Identical in every process (capture is
    computed process-locally on the same deterministic inputs; the recon
    chunk is one shard_map program over the global mesh)."""
    import jax
    import jax.numpy as jnp
    import shiftedscalequantization_tpu as ssq
    from shiftedscalequantization_tpu.parallel import dist
    from shiftedscalequantization_tpu.parallel.mesh import make_mesh
    from shiftedscalequantization_tpu.recon import ReconSettings

    graph, params, qstate, _ = tiny_problem()
    node = "model.conv1"
    calib = jnp.asarray(np.random.default_rng(11).normal(
        size=(16, 8, 8, 3)).astype(np.float32))
    cin, cout = ssq.forward(graph, params, qstate, calib, ssq.Flags(),
                            capture=node)
    mesh = make_mesh(n_data=4, devices=devices)
    qs, m = dist.ddp_reconstruct(
        graph, params, qstate, node, np.asarray(cin), np.asarray(cout),
        ReconSettings(mode="brecq", iters=8, batch_size=8, chunk=4),
        jax.random.PRNGKey(12), mesh, wire="int8")
    alpha = np.asarray(
        jax.device_get(qs[node].wq.alpha)).astype(np.float64)
    return {"hard": float(m["hard_loss"]),
            "alpha_sum": float(alpha.sum()),
            "alpha_absmax": float(np.abs(alpha).max())}


def test_two_process_ddp_recon_matches_single_process(tmp_path):
    """The explicit-DDP int8-wire recon must produce identical results
    run as 2 real processes x 2 devices vs 1 process x 4 faked devices
    (same 4-device mesh program; reference multi-GPU recon equivalence,
    Brecq/main_imagenet_dist.py:174-176 + block_recon.py:100-102)."""
    port = _free_port()
    env_base = {
        **os.environ,
        "PYTHONPATH": REPO,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_PLATFORMS": "cpu",
        "SSQ_NUM_PROCESSES": "2",
        "SSQ_COORDINATOR": f"localhost:{port}",
        "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "cache"),
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "SSQ_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER_DDP], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-4000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    assert results[0] == {**results[1], "pid": 0}

    # single-process ground truth on a 4-device submesh of the faked 8
    import jax
    want = ddp_recon_problem(jax.devices()[:4])
    got = {k: v for k, v in results[0].items() if k != "pid"}
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-6), (k, got, want)


def test_two_process_distributed_validate(tmp_path):
    port = _free_port()
    env_base = {
        **os.environ,
        "PYTHONPATH": REPO,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_PLATFORMS": "cpu",
        "SSQ_NUM_PROCESSES": "2",
        "SSQ_COORDINATOR": f"localhost:{port}",
        # keep worker compile caches apart from the session cache
        "JAX_COMPILATION_CACHE_DIR": str(tmp_path / "cache"),
    }
    procs = []
    for pid in range(2):
        env = {**env_base, "SSQ_PROCESS_ID": str(pid)}
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-4000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    assert {r["pid"] for r in results} == {0, 1}
    assert results[0]["acc"] == results[1]["acc"]

    # ground truth: single-process, single-device eval of the same problem
    from shiftedscalequantization_tpu.utils.eval import validate_model
    graph, params, qstate, data = tiny_problem()
    want = validate_model(graph, params, qstate, data)
    assert results[0]["acc"] == pytest.approx(
        {k: float(v) for k, v in want.items()}, abs=1e-6)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
