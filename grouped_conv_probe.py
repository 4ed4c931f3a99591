"""Microbenchmark: grouped 3x3 conv variants on RegNetX shapes (NEXT.md #2).

RegNetX-600M runs 24-wide grouped 3x3 convs (models/regnet.py CONFIGS);
the deploy plan's thin rule (min(out, in/groups) < 128) sends EVERY f.b
conv to bf16_codes, and e2e the int path is 1.01x bf16. This probe
measures bf16 vs int8 vs block-diagonal-packed variants on the real
per-stage shapes so the plan rule can pick winners from data.

Usage: python grouped_conv_probe.py [batch]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 256

# (name, H=W in, channels, groups, stride, count) — RegNetX-600M f.b convs
SHAPES = [
    ("s1.b1 48ch g2 112px s2", 112, 48, 2, 2, 1),
    ("s2.b1 96ch g4 56px s2", 56, 96, 4, 2, 1),
    ("s2.b2+ 96ch g4 28px s1", 28, 96, 4, 1, 2),
    ("s3.b1 240ch g10 28px s2", 28, 240, 10, 2, 1),
    ("s3.b2+ 240ch g10 14px s1", 14, 240, 10, 1, 4),
    ("s4.b1 528ch g22 14px s2", 14, 528, 22, 2, 1),
    ("s4.b2+ 528ch g22 7px s1", 7, 528, 22, 1, 6),
]
# thin dense 1x1s (s1/s2): (name, H=W, cin, cout, count)
SHAPES_1X1 = [
    ("s1 1x1 32/48ch 56px", 56, 48, 48, 2),
    ("s2 1x1 96ch 28px", 28, 96, 96, 6),
]


def time_fn(fn, x, iters=30):
    def run_body(x):
        def body(acc, i):
            y = fn(x + i.astype(x.dtype))
            return acc + y.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc
    run = jax.jit(run_body)
    float(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3  # ms


def conv(x, w_hwio, stride, fg, ptype, k=3):
    pad = (1, 1) if k == 3 else (0, 0)
    return jax.lax.conv_general_dilated(
        x, w_hwio, window_strides=(stride, stride), padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fg, preferred_element_type=ptype)


def block_diag_weights(w, groups, super_g):
    """(3,3,gw,C) grouped -> (3,3,gw*super_g,C) zeros off-diagonal,
    feature_group_count = groups // super_g."""
    gw, c = w.shape[2], w.shape[3]
    ocg = c // groups
    out = np.zeros((3, 3, gw * super_g, c), w.dtype)
    for g in range(groups):
        _, lane = divmod(g, super_g)
        out[:, :, lane * gw:(lane + 1) * gw,
            g * ocg:(g + 1) * ocg] = np.asarray(
                w[:, :, :, g * ocg:(g + 1) * ocg])
    return jnp.asarray(out), groups // super_g


def main():
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    print(f"device={tpu}, batch={BATCH}")
    rng = np.random.default_rng(0)
    tot = {}

    def add(key, ms, count):
        tot[key] = tot.get(key, 0.0) + ms * count

    for name, hw, c, groups, stride, count in SHAPES:
        gw = c // groups
        with jax.default_device(cpu):
            xc = jnp.asarray(
                rng.integers(-8, 8, (BATCH, hw, hw, c)), jnp.int8)
            wc = jnp.asarray(rng.integers(-2, 2, (3, 3, gw, c)), jnp.int8)
        xi = jax.device_put(xc, tpu)
        wi = jax.device_put(wc, tpu)
        xb = jax.device_put(xc.astype(jnp.bfloat16), tpu)
        wb = jax.device_put(wc.astype(jnp.bfloat16), tpu)
        rows = []
        rows.append(("bf16 grouped", time_fn(
            lambda x: conv(x, wb, stride, groups, jnp.float32), xb)))
        rows.append(("int8 grouped", time_fn(
            lambda x: conv(x, wi, stride, groups, jnp.int32), xi)))
        wd, _ = block_diag_weights(wc, groups, groups)
        wdi = jax.device_put(wd.astype(jnp.int8), tpu)
        rows.append(("int8 dense-bd", time_fn(
            lambda x: conv(x, wdi, stride, 1, jnp.int32), xi)))
        sg = max(1, min(128 // gw, groups))
        while groups % sg:
            sg -= 1
        if 1 < sg < groups:
            ws, ng = block_diag_weights(wc, groups, sg)
            wsi = jax.device_put(ws.astype(jnp.int8), tpu)
            rows.append((f"int8 super-g{sg} (fg={ng})", time_fn(
                lambda x: conv(x, wsi, stride, ng, jnp.int32), xi)))
        print(f"\n{name} (gw={gw}, x{count}):")
        for rname, ms in rows:
            print(f"  {rname:24s} {ms:7.3f} ms")
        add("bf16 (current)", rows[0][1], count)
        add("int8 grouped", rows[1][1], count)
        add("best", min(r[1] for r in rows), count)

    for name, hw, cin, cout, count in SHAPES_1X1:
        with jax.default_device(cpu):
            xc = jnp.asarray(
                rng.integers(-8, 8, (BATCH, hw, hw, cin)), jnp.int8)
            wc = jnp.asarray(
                rng.integers(-2, 2, (1, 1, cin, cout)), jnp.int8)
        xi = jax.device_put(xc, tpu)
        wi = jax.device_put(wc, tpu)
        xb = jax.device_put(xc.astype(jnp.bfloat16), tpu)
        wb = jax.device_put(wc.astype(jnp.bfloat16), tpu)
        b16 = time_fn(lambda x: conv(x, wb, 1, 1, jnp.float32, k=1), xb)
        i8 = time_fn(lambda x: conv(x, wi, 1, 1, jnp.int32, k=1), xi)
        print(f"\n{name} (x{count}): bf16 {b16:.3f} ms | int8 {i8:.3f} ms")

    print("\nf.b totals (ms/batch):")
    for k, v in tot.items():
        print(f"  {k:16s} {v:7.3f}")


if __name__ == "__main__":
    main()
