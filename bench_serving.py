"""Serving-shape coverage: small/medium-batch deploy-vs-bf16 sweep for all
five model families, plus the packed-W2 HBM win measured in its design
regime (VERDICT r4 weak #7).

Part 1 (--sweep): batch {1, 64, 128} x {resnet18, resnet50, mobilenetv2,
regnetx_600m, mnasnet} int8-deploy vs bf16 ms/batch on the real chip,
reusing bench.py's on-device-scan timing (remote dispatch RTT makes
host-side timing meaningless — CLAUDE.md landmine 2).

Part 2 (--packed): batch-1 large-fc quant-matmul — the weight-dominated
shape sub-byte packing exists for (weights >> activations: W2 weights
resident at 16 codes/int32 = 4x less HBM than int8). Compares the Pallas
packed-W2 kernel (ops/pallas/packed.py) against the XLA int8 path and
bf16 at M=1, K=N=8192: weight bytes dominate the forward at M=1, so the
4x HBM reduction should show directly (int8 64 MB vs packed 16 MB).

Writes round5_logs/bench_serving.json. One TPU client at a time
(CLAUDE.md landmine 8): run from the serialized queue only.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ap = argparse.ArgumentParser()
ap.add_argument("--sweep", action="store_true")
ap.add_argument("--packed", action="store_true")
ap.add_argument("--archs", default="resnet18,resnet50,mobilenetv2,"
                                   "regnetx_600m,mnasnet")
ap.add_argument("--batches", default="1,64,128")
ap.add_argument("--out", default="round5_logs/bench_serving.json")
A = ap.parse_args()
if not (A.sweep or A.packed):
    A.sweep = A.packed = True

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

os.makedirs("/tmp/jax_cache_axon", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import bench  # noqa: E402  (time_fn + bench_arch)

results = {}


def save():
    os.makedirs(os.path.dirname(A.out), exist_ok=True)
    with open(A.out, "w") as f:
        json.dump(results, f, indent=1)


if A.sweep:
    sweep = {}
    for arch in A.archs.split(","):
        for batch in (int(b) for b in A.batches.split(",")):
            iters = max(20, 2048 // max(batch, 1))  # amortize the scan
            t0 = time.time()
            try:
                ips, fp_ips, q_t, fp_t, agree, rel = bench.bench_arch(
                    arch, batch, iters, 224)
                row = {"int8_ms": round(q_t * 1e3, 3),
                       "bf16_ms": round(fp_t * 1e3, 3),
                       "int8_img_s": round(ips, 1),
                       "bf16_img_s": round(fp_ips, 1),
                       "vs_bf16": round(ips / fp_ips, 3),
                       "agreement": round(agree, 4),
                       "rel_mse": float(f"{rel:.3e}"),
                       "wall_s": round(time.time() - t0, 1)}
            except Exception as e:
                row = {"error": str(e)[:200]}
            sweep[f"{arch}@b{batch}"] = row
            print(f"{arch}@b{batch}: {row}", flush=True)
            results["sweep"] = sweep
            save()

if A.packed:
    from shiftedscalequantization_tpu.ops.pallas.packed import (
        pack_codes, packed_quant_matmul)

    cpu = jax.local_devices(backend="cpu")[0]
    tpu = jax.devices()[0]
    M = int(os.environ.get("PACKED_M", 1))
    K = int(os.environ.get("PACKED_K", 8192))
    N = int(os.environ.get("PACKED_N", 8192))
    with jax.default_device(cpu):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (M, K), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
        # W2 per-out-channel max-scale codes
        scale = jnp.abs(w).max(axis=0) / 1.5
        q = jnp.clip(jnp.round(w / scale) + 2, 0, 3).astype(jnp.int8)
        wp = pack_codes(q, 2)                          # (K/16, N) int32
        w_int8 = (q - 2).astype(jnp.int8)              # zp folded
        bias = jnp.zeros((N,), jnp.float32)
        w_bf16 = ((q.astype(jnp.float32) - 2) * scale).astype(jnp.bfloat16)
    x, wp, w_int8, scale, bias, w_bf16 = jax.device_put(
        (x, wp, w_int8, scale, bias, w_bf16), tpu)

    act_delta, act_zp = 4.0 / 15, 7.0

    # weights are passed as JIT ARGUMENTS, never closed over: closure-
    # captured arrays serialize into the remote compile payload as
    # constants and the service rejects them above its size limit
    # (observed HTTP 413 at K=N=16384 int8 = 256 MB; CLAUDE.md
    # landmine 9)
    def run_packed(x, wp, scale, bias):
        return packed_quant_matmul(x, wp, jnp.full((N,), 2.0), scale, bias,
                                   act_delta, act_zp, bits=2)

    def run_int8_xla(x, w_int8, scale, bias):
        # same math through XLA: quantize act -> int8 matmul -> dequant
        xq = jnp.clip(jnp.round(x / act_delta) + act_zp, 0, 15) - act_zp
        acc = jax.lax.dot_general(
            xq.astype(jnp.int8), w_int8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (act_delta * scale)

    def run_bf16(x, w_bf16, scale, bias):
        return (x.astype(jnp.bfloat16) @ w_bf16).astype(jnp.float32)

    def time_fn_args(fn, x, extras, iters):
        """bench.time_fn with the big operands as real jit arguments."""
        import time as _time

        def run_body(x, extras):
            def body(acc, i):
                y = fn(x + i.astype(x.dtype) * 1e-6, *extras)
                return acc + y.sum(dtype=jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(iters, dtype=jnp.int32))
            return acc
        run = jax.jit(run_body)
        float(run(x, extras))
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            float(run(x, extras))
            best = min(best, _time.perf_counter() - t0)
        return best / iters

    iters = 200
    rows = {}
    for name, fn, extras in (
            ("packed_w2", run_packed, (wp, scale, bias)),
            ("int8_xla", run_int8_xla, (w_int8, scale, bias)),
            ("bf16", run_bf16, (w_bf16, scale, bias))):
        t = time_fn_args(fn, x, extras, iters)
        wbytes = {"packed_w2": K * N // 16 * 4, "int8_xla": K * N,
                  "bf16": K * N * 2}[name]
        rows[name] = {"ms": round(t * 1e3, 4),
                      "weight_MB": round(wbytes / 2 ** 20, 1),
                      "hbm_floor_us": round(wbytes / 819e9 * 1e6, 1)}
        print(f"packed-fc {name}: {rows[name]}", flush=True)
    rows["shape"] = f"M={M} K={K} N={N} (batch-1 large fc, "\
                    "weight-dominated)"
    rows["packed_vs_int8"] = round(
        rows["int8_xla"]["ms"] / rows["packed_w2"]["ms"], 3)
    results["packed_fc"] = rows
    save()

print(json.dumps(results.get("packed_fc", {}).get("packed_vs_int8",
                                                  "sweep-only")))
