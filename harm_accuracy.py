"""Harmonization accuracy measurement on a trained MNASNet (cifar variant).

The MNASNet 1.022x deploy row (BENCHMARKS.md) uses residual-chain
act-step harmonization, which coarsens member grids by up to ~8x on the
bench config. This measures the actual top-1 cost on a trained model:
the full pipeline (quant-init -> calibrate -> [harmonize] -> per-unit
brecq recon -> act phase) with and without --harmonize_residual, then
true-int deploy parity on the harmonized state.

Usage: python harm_accuracy.py [--iters 600] [--platform tpu|cpu]
Writes round3_logs/harm_accuracy.json.
"""
import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=600)
ap.add_argument("--iters_a", type=int, default=300)
ap.add_argument("--platform", default="tpu", choices=["cpu", "tpu"])
ap.add_argument("--out", default="round3_logs/harm_accuracy.json")
A = ap.parse_args()

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

if A.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    cache = "/tmp/jax_cache_cpu"
else:
    cache = "/tmp/jax_cache_axon"
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

CKPT = "trained_mnasnet_synth10.npz"
if not os.path.exists(CKPT):
    from shiftedscalequantization_tpu.train import main as train_main
    print("[train] mnasnet synth10: 3000 steps on-device", flush=True)
    train_main(["--arch", "mnasnet", "--dataset", "synth10",
                "--steps", "3000", "--batch_size", "128", "--out", CKPT])


def run_cli(tag, harmonize):
    from shiftedscalequantization_tpu import cli
    argv = ["--dataset", "synth10", "--arch", "mnasnet",
            "--pretrained", CKPT, "--mode", "brecq",
            "--n_bits_w", "2", "--n_bits_a", "4",
            "--iters_w", str(A.iters), "--iters_a", str(A.iters_a),
            "--num_samples", "256", "--batch_size", "64",
            "--harmonize_residual", "true" if harmonize else "false",
            "--skip_test", "true",     # per-unit trajectory evals are the
                                       # wall-clock on ~20 mnasnet targets
            "--checkpoint_dir", f"./checkPoint/harm_{tag}",
            "--log_path", f"/tmp/harm_{tag}.log"]
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            sys.__stdout__.write(s)
            return len(s)

    t0 = time.time()
    with contextlib.redirect_stdout(Tee()):
        final = cli.main(argv)
    out = buf.getvalue()
    coars = re.findall(r"worst step coarsening ([\d.]+)x", out)
    return {"tag": tag, "final": final,
            "worst_coarsening": float(coars[0]) if coars else None,
            "wall_s": round(time.time() - t0, 1)}


def deploy_check(tag, harmonize):
    """sim vs true-int deploy top-1 on the recovered state."""
    import jax.numpy as jnp
    import numpy as np

    import shiftedscalequantization_tpu as ssq
    from shiftedscalequantization_tpu import deploy
    from shiftedscalequantization_tpu.data.realdata import \
        synth10_test_arrays
    from shiftedscalequantization_tpu.models import zoo
    from shiftedscalequantization_tpu.quantize import act_flags
    from shiftedscalequantization_tpu.train import load_raw_params
    from shiftedscalequantization_tpu.utils import checkpoint as ckpt

    cpus = jax.local_devices(backend="cpu")
    ctx = jax.default_device(cpus[0]) if cpus else contextlib.nullcontext()
    with ctx:
        graph, _ = zoo.build("mnasnet", dataset="synth10")
        raw = load_raw_params(CKPT)
        cfg = ssq.QuantConfig(n_bits_w=2, n_bits_a=4)
        params, _ = ssq.prepare_model(graph, raw, cfg)
        qstate, _ = ckpt.load_qstate(f"./checkPoint/harm_{tag}/QNN_W2_A4")
        x_te, y_te = synth10_test_arrays()
        flags = act_flags(graph, cfg, base=ssq.Flags().all_weights(graph))
        dparams = deploy.build_deploy_params(graph, params, qstate)
        steps = deploy.act_steps_from_qstate(graph, qstate)
        plan = deploy.make_deploy_plan(graph, dparams, steps,
                                       input_hw=(32, 32))
        n_sum = len(plan.get("__sum_steps__", {}))

    def top1(fn):
        good = tot = 0
        for i in range(0, len(x_te), 256):
            xb = jnp.asarray(x_te[i:i + 256])
            pred = np.asarray(jnp.argmax(fn(xb), -1))
            good += int((pred == np.asarray(y_te[i:i + 256])).sum())
            tot += len(pred)
        return round(100.0 * good / tot, 3)

    sim = top1(jax.jit(lambda x: ssq.forward(graph, params, qstate, x,
                                             flags)))
    dep = top1(jax.jit(lambda x: deploy.deploy_forward(
        graph, dparams, steps, x, plan)))
    return {"sim": sim, "deploy": dep, "sum_sites": n_sum}


results = {}
for tag, harm in (("plain", False), ("harmonized", True)):
    print(f"\n===== harm_accuracy: {tag} =====", flush=True)
    results[tag] = run_cli(tag, harm)
    results[tag]["deploy_check"] = deploy_check(tag, harm)
    print(json.dumps(results[tag], default=str), flush=True)
    os.makedirs(os.path.dirname(A.out), exist_ok=True)
    with open(A.out, "w") as f:
        json.dump(results, f, indent=1, default=str)
print(f"wrote {A.out}")
