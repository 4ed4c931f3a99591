"""Op-level timing: pair-fed expand conv, decomposed vs f32-materialized.

The e2e MNASNet bench measured pairs-on (2 int8 convs per consumer) at
20.43 ms vs pairs-off (f32 materialize + 2-pass bf16 split) at 20.5 —
no win, despite int8 conv ~1.4x bf16 per op. This isolates one consumer
at the real stage shapes to see whether the decomposition wins at op
level at all (if yes, the e2e deficit is fusion/liveness; if no, the
int8-conv-per-term model is wrong and pairs should stay off).

Strategies, each producing the consumer's 4-bit output codes:
  a) f32 = q1*d1 + q2*d2 (elementwise), expand conv as 2-pass bf16
     hi/lo split, fused requant epilogue.
  b) conv(q1)*d1 + conv(q2)*d2 as 2 int8 MXU convs, requant epilogue.
  c) (ceiling) single-pass bf16 conv of the f32 sum (numerically unsafe).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache_axon", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from bench import time_fn  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", 256))
ITERS = int(os.environ.get("BENCH_ITERS", 20))

cpu = jax.local_devices(backend="cpu")[0]
tpu = jax.devices()[0]

# (H, C_in, C_out): MNASNet scale=2.0 pair-consumer expand convs
SHAPES = [(56, 48, 144), (28, 80, 240), (14, 160, 960), (14, 192, 1152),
          (7, 384, 2304)]

for H, CI, CO in SHAPES:
    with jax.default_device(cpu):
        k = jax.random.PRNGKey(0)
        q1 = jax.random.randint(k, (B, H, H, CI), -8, 8, jnp.int8)
        q2 = jax.random.randint(jax.random.PRNGKey(1), (B, H, H, CI), -8, 8,
                                jnp.int8)
        w = jax.random.randint(jax.random.PRNGKey(2), (1, 1, CI, CO), -2, 2,
                               jnp.int8)
    q1, q2, w = (jax.device_put(t, tpu) for t in (q1, q2, w))
    d1, d2 = jnp.float32(0.37), jnp.float32(0.43)
    M, C = jnp.float32(0.11), jnp.float32(8.5)
    dn = ("NHWC", "HWIO", "NHWC")

    def requant(acc):
        return jnp.clip(jnp.floor(acc * M + C), 0, 15).astype(jnp.int8)

    def conv(x, wgt, dtype):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), wgt.astype(dtype), (1, 1), "SAME",
            dimension_numbers=dn, preferred_element_type=jnp.float32
            if dtype == jnp.bfloat16 else jnp.int32)

    def a_f32_2pass(x8):
        xf = q1.astype(jnp.float32) * d1 + (q2 + x8).astype(jnp.float32) * d2
        x_hi = xf.astype(jnp.bfloat16)
        x_lo = (xf - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = (conv(x_hi, w, jnp.bfloat16)
               + conv(x_lo, w, jnp.bfloat16))
        return requant(acc)

    def b_pair_int8(x8):
        acc = (conv(q1, w, jnp.int8).astype(jnp.float32) * d1
               + conv(q2 + x8, w, jnp.int8).astype(jnp.float32) * d2)
        return requant(acc)

    def c_f32_1pass(x8):
        xf = q1.astype(jnp.float32) * d1 + (q2 + x8).astype(jnp.float32) * d2
        return requant(conv(xf.astype(jnp.bfloat16), w, jnp.bfloat16))

    row = [f"{H:3d}px {CI:4d}->{CO:4d}"]
    for name, fn in (("f32+2pass", a_f32_2pass), ("pair-int8", b_pair_int8),
                     ("f32+1pass", c_f32_1pass)):
        # time_fn perturbs x additively; x8 is an int8 zero so the perturb
        # lands on codes without changing dtype semantics
        z = jax.device_put(jnp.zeros((B, H, H, CI), jnp.int8), tpu)
        t = time_fn(lambda x, f=fn: f(x.astype(jnp.int8)), z, ITERS) * 1e3
        row.append(f"{name} {t:6.3f}ms")
    print("  ".join(row), flush=True)
