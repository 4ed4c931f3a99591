"""bf16_codes vs int8 plan kinds at MNASNet's 'thin' 1x1 conv shapes.

make_deploy_plan routes units with min(out_ch, in_ch/groups) < 128 to
bf16_codes (thin_channels rule, tuned on ResNet/RegNet shapes round 1).
MNASNet scale=2.0 puts most of its expand/proj 1x1s under that bar at
large spatial dims where the int8 input (1 B vs 2 B/elem) and 4x MXU
peak could still win. Measures both forms + the requant epilogue, plus
the depthwise middle conv (always bf16_codes today) as bf16 vs int8
feature-group conv.
"""
import os
import sys

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
dn = ("NHWC", "HWIO", "NHWC")

# (H, CI, CO, groups): mnasnet scale=2.0 thin units
SHAPES = [
    (112, 64, 64, 64),     # stem depthwise 3x3
    (112, 64, 32, 1),      # layers.6 proj
    (112, 32, 96, 1),      # 8.0 expand
    (56, 96, 48, 1),       # 8.0 proj
    (56, 48, 144, 1),      # 8.x expand
    (56, 144, 48, 1),      # 8.x proj
    (28, 144, 80, 1),      # 9.0 proj
    (28, 80, 240, 1),      # 10.0 expand in
    (14, 240, 160, 1),     # 10.0 proj
    (14, 480, 160, 1),
]

for H, CI, CO, G in SHAPES:
    k = 3 if G > 1 else 1
    with jax.default_device(cpu):
        x = jax.random.randint(jax.random.PRNGKey(0), (B, H, H, CI), -8, 8,
                               jnp.int8)
        w = jax.random.randint(jax.random.PRNGKey(1), (k, k, CI // G, CO),
                               -2, 2, jnp.int8)
    x, w = jax.device_put(x, tpu), jax.device_put(w, tpu)
    M, C = jnp.float32(0.11), jnp.float32(8.5)

    def requant(acc):
        return jnp.clip(jnp.floor(acc * M + C), 0, 15).astype(jnp.int8)

    def f_bf16_codes(xi):
        acc = jax.lax.conv_general_dilated(
            xi.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=dn, feature_group_count=G,
            preferred_element_type=jnp.float32)
        return requant(acc)

    def f_int8(xi):
        acc = jax.lax.conv_general_dilated(
            xi, w, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=G, preferred_element_type=jnp.int32)
        return requant(acc.astype(jnp.float32))

    row = [f"{H:3d}px {CI:4d}->{CO:4d} g{G:3d}"]
    for name, fn in (("bf16_codes", f_bf16_codes), ("int8", f_int8)):
        t = time_fn(lambda v, f=fn: f(v.astype(jnp.int8)), x, ITERS) * 1e3
        row.append(f"{name} {t:7.3f}ms")
    print("  ".join(row), flush=True)
