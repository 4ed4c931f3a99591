"""Microbench: MNV2 features.2 block variants on TPU.

Isolates where the int path's per-block overhead vs the bf16 baseline
comes from (BENCHMARKS.md MobileNetV2 section). Shapes: input
(B,112,112,16), expand 1x1 -> 96, dw 3x3 s2, project 1x1 -> 24.
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

from bench import time_fn

B = int(os.environ.get("BENCH_BATCH", 256))
H = 112
CI, CE, CO = 16, 96, 24

cpu = jax.local_devices(backend="cpu")[0]
tpu = jax.devices()[0]
k = jax.random.PRNGKey(0)
with jax.default_device(cpu):
    x_f = jax.random.normal(k, (B, H, H, CI), jnp.bfloat16)
    x_i = jax.random.randint(k, (B, H, H, CI), -8, 8, jnp.int8)
    we = jax.random.normal(k, (1, 1, CI, CE), jnp.bfloat16)
    wd = jax.random.normal(k, (3, 3, 1, CE), jnp.bfloat16)
    wp = jax.random.normal(k, (1, 1, CE, CO), jnp.bfloat16)
    wei = jax.random.randint(k, (1, 1, CI, CE), -2, 2, jnp.int8)
    wdi = jax.random.randint(k, (3, 3, 1, CE), -2, 2, jnp.int8)
    wpi = jax.random.randint(k, (1, 1, CE, CO), -2, 2, jnp.int8)
    sc_e = jax.random.uniform(k, (CE,)) * 0.1
    sc_d = jax.random.uniform(k, (CE,)) * 0.1
    sc_p = jax.random.uniform(k, (CO,)) * 0.1

put = jax.device_put
x_f, x_i, we, wd, wp, wei, wdi, wpi, sc_e, sc_d, sc_p = jax.tree.map(
    lambda t: put(t, tpu), (x_f, x_i, we, wd, wp, wei, wdi, wpi,
                            sc_e, sc_d, sc_p))

dn = ("NHWC", "HWIO", "NHWC")


def conv(x, w, stride=(1, 1), pad="SAME", groups=1, pet=None):
    return jax.lax.conv_general_dilated(
        x, w, stride, pad, dimension_numbers=dn,
        feature_group_count=groups,
        preferred_element_type=pet)


def requant(y, sc, nb=4):
    q = jnp.clip(jnp.round(y * sc), 0, 2 ** nb - 1)
    return q


# 1) baseline bf16 block
def blk_bf16(x):
    y = jax.nn.relu6(conv(x, we))
    y = jax.nn.relu6(conv(y, wd, (2, 2), groups=CE))
    return conv(y, wp)


# 2) int path as deploy does (bf16_codes): cast codes->bf16, conv, f32
#    acc, f32 epilogue + requant -> next codes
def blk_int(xi):
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we, pet=jnp.float32)
    q1 = requant(jax.nn.relu6(a1 * sc_e), 4.0).astype(jnp.bfloat16)
    a2 = conv(q1, wd, (2, 2), groups=CE, pet=jnp.float32)
    q2 = requant(jax.nn.relu6(a2 * sc_d), 4.0).astype(jnp.bfloat16)
    a3 = conv(q2, wp, pet=jnp.float32)
    return (a3 * sc_p).astype(jnp.bfloat16)


# 3) int path, bf16 accumulate/epilogue everywhere (no f32 anywhere)
def blk_int_bf16acc(xi):
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we)
    q1 = requant(jax.nn.relu6(a1 * sc_e.astype(jnp.bfloat16)), 4.0)
    a2 = conv(q1, wd, (2, 2), groups=CE)
    q2 = requant(jax.nn.relu6(a2 * sc_d.astype(jnp.bfloat16)), 4.0)
    a3 = conv(q2, wp)
    return a3 * sc_p.astype(jnp.bfloat16)


# 4) true-int8 convs (int8 operands, int32 accumulate)
def blk_int8mxu(xi):
    a1 = conv(xi, wei, pet=jnp.int32).astype(jnp.float32)
    q1 = requant(jax.nn.relu6(a1 * sc_e), 4.0).astype(jnp.int8)
    a2 = conv(q1, wdi, (2, 2), groups=CE, pet=jnp.int32).astype(jnp.float32)
    q2 = requant(jax.nn.relu6(a2 * sc_d), 4.0).astype(jnp.int8)
    a3 = conv(q2, wpi, pet=jnp.int32).astype(jnp.float32)
    return (a3 * sc_p).astype(jnp.bfloat16)


# isolated dw convs
def dw_bf16(x96):
    return conv(x96, wd, (2, 2), groups=CE)


def dw_int8(x96i):
    return conv(x96i, wdi, (2, 2), groups=CE, pet=jnp.int32)


with jax.default_device(cpu):
    x96 = jax.random.normal(k, (B, H, H, CE), jnp.bfloat16)
    x96i = jax.random.randint(k, (B, H, H, CE), -8, 8, jnp.int8)
x96, x96i = put(x96, tpu), put(x96i, tpu)

iters = int(os.environ.get("BENCH_ITERS", 50))
for name, fn, arg in [
        ("block bf16 baseline", blk_bf16, x_f),
        ("block int bf16_codes+f32acc (deploy)", blk_int, x_i),
        ("block int bf16 acc everywhere", blk_int_bf16acc, x_i),
        ("block int8 MXU convs", lambda x: blk_int8mxu(x.astype(jnp.int8)), x_i),
        ("dw conv bf16", dw_bf16, x96),
        ("dw conv int8", lambda x: dw_int8(x.astype(jnp.int8)), x96i),
]:
    t = time_fn(jax.jit(fn), arg, iters) * 1e3
    print(f"{name:40s} {t:7.3f} ms")


# --- overhead isolation variants ---
def blk_noepi(xi):
    """conv chain only (cast input, no requant epilogues)."""
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we)
    a2 = conv(jax.nn.relu6(a1), wd, (2, 2), groups=CE)
    return conv(jax.nn.relu6(a2), wp)


def blk_mulonly(xi):
    """per-channel scale between convs, no round/clip."""
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we)
    a2 = conv(jax.nn.relu6(a1 * sc_e.astype(jnp.bfloat16)), wd, (2, 2),
              groups=CE)
    return conv(jax.nn.relu6(a2 * sc_d.astype(jnp.bfloat16)), wp)


def blk_round(xi):
    """adds round but no clip."""
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we)
    q1 = jnp.round(jax.nn.relu6(a1 * sc_e.astype(jnp.bfloat16)))
    a2 = conv(q1, wd, (2, 2), groups=CE)
    q2 = jnp.round(jax.nn.relu6(a2 * sc_d.astype(jnp.bfloat16)))
    return conv(q2, wp)


for name, fn, arg in [
        ("block no epilogue", blk_noepi, x_i),
        ("block mul-only epilogue", blk_mulonly, x_i),
        ("block mul+round epilogue", blk_round, x_i),
]:
    t = time_fn(jax.jit(fn), arg, iters) * 1e3
    print(f"{name:40s} {t:7.3f} ms")


MAGIC = jnp.float32(1.5 * 2.0 ** 23)


def magic_round(y):
    """Exact round-to-nearest-even for |y| < 2^22 via mantissa alignment
    (two fusable adds instead of XLA's RoundNearestEven)."""
    return jax.lax.optimization_barrier(y + MAGIC) - MAGIC


def blk_magic(xi):
    """full requant epilogues with magic rounding, f32 epilogue math."""
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we, pet=jnp.float32)
    q1 = jnp.clip(magic_round(jax.nn.relu6(a1 * sc_e) * 2.5), 0, 15) \
        .astype(jnp.bfloat16)
    a2 = conv(q1, wd, (2, 2), groups=CE, pet=jnp.float32)
    q2 = jnp.clip(magic_round(jax.nn.relu6(a2 * sc_d) * 2.5), 0, 15) \
        .astype(jnp.bfloat16)
    a3 = conv(q2, wp, pet=jnp.float32)
    return (a3 * sc_p).astype(jnp.bfloat16)


def blk_castround(xi):
    """round via f32->int32 convert (round-to-nearest in XLA?) + clip."""
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we, pet=jnp.float32)
    q1 = jnp.clip(jax.nn.relu6(a1 * sc_e) * 2.5 + 0.5, 0, 15) \
        .astype(jnp.int32).astype(jnp.bfloat16)
    a2 = conv(q1, wd, (2, 2), groups=CE, pet=jnp.float32)
    q2 = jnp.clip(jax.nn.relu6(a2 * sc_d) * 2.5 + 0.5, 0, 15) \
        .astype(jnp.int32).astype(jnp.bfloat16)
    a3 = conv(q2, wp, pet=jnp.float32)
    return (a3 * sc_p).astype(jnp.bfloat16)


for name, fn, arg in [
        ("block magic-round epilogue", blk_magic, x_i),
        ("block cast-round epilogue", blk_castround, x_i),
]:
    t = time_fn(jax.jit(fn), arg, iters) * 1e3
    print(f"{name:40s} {t:7.3f} ms")

# numeric equivalence of magic vs jnp.round on a code grid
y = jnp.linspace(-20, 20, 40001, dtype=jnp.float32)
import numpy as np
print("magic==round:",
      bool(jnp.all(magic_round(y) == jnp.round(y))))


# bitcast-round: for v = y + 1.5*2^23 in [2^23, 2^24), f32 spacing is 1
# and bitcast_i32(v) increments by 1 per unit -> round(y) =
# bitcast_i32(v) - bitcast_i32(1.5*2^23). Elementwise, fusable, and
# opaque to XLA's (x+c)-c simplifier. Exact round-to-nearest-even.
MAGIC_BITS = jnp.int32(np.float32(1.5 * 2 ** 23).view(np.int32)
                       if False else 0)
import numpy as _np
MAGIC_BITS = jnp.int32(_np.float32(1.5 * 2 ** 23).view(_np.int32))


def bitcast_round_codes(y, lo, hi):
    v = jax.lax.bitcast_convert_type(y + MAGIC, jnp.int32) - MAGIC_BITS
    return jnp.clip(v, lo, hi)


def blk_bitcast(xi):
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we, pet=jnp.float32)
    q1 = bitcast_round_codes(jax.nn.relu6(a1 * sc_e) * 2.5, 0, 15) \
        .astype(jnp.bfloat16)
    a2 = conv(q1, wd, (2, 2), groups=CE, pet=jnp.float32)
    q2 = bitcast_round_codes(jax.nn.relu6(a2 * sc_d) * 2.5, 0, 15) \
        .astype(jnp.bfloat16)
    a3 = conv(q2, wp, pet=jnp.float32)
    return (a3 * sc_p).astype(jnp.bfloat16)


def blk_floor(xi):
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we, pet=jnp.float32)
    q1 = jnp.clip(jnp.floor(jax.nn.relu6(a1 * sc_e) * 2.5 + 0.5), 0, 15) \
        .astype(jnp.bfloat16)
    a2 = conv(q1, wd, (2, 2), groups=CE, pet=jnp.float32)
    q2 = jnp.clip(jnp.floor(jax.nn.relu6(a2 * sc_d) * 2.5 + 0.5), 0, 15) \
        .astype(jnp.bfloat16)
    a3 = conv(q2, wp, pet=jnp.float32)
    return (a3 * sc_p).astype(jnp.bfloat16)


for name, fn, arg in [
        ("block bitcast-round epilogue", blk_bitcast, x_i),
        ("block floor-round epilogue", blk_floor, x_i),
]:
    t = time_fn(jax.jit(fn), arg, iters) * 1e3
    print(f"{name:40s} {t:7.3f} ms")

yv = jnp.linspace(-300, 300, 600001, dtype=jnp.float32)
print("bitcast==round:", bool(jnp.all(
    bitcast_round_codes(yv, -1000, 1000).astype(jnp.float32)
    == jnp.round(yv))))


def blk_floor_bf16(xi):
    """floor-round, bf16 conv outputs (no f32 pet), folded relu6+clip:
    one clip with per-channel upper bound subsumes relu6."""
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we)
    q1 = jnp.clip(jnp.floor(a1 * sc_e.astype(jnp.bfloat16) * 2.5 + 0.5),
                  0, 15)
    a2 = conv(q1, wd, (2, 2), groups=CE)
    q2 = jnp.clip(jnp.floor(a2 * sc_d.astype(jnp.bfloat16) * 2.5 + 0.5),
                  0, 15)
    return conv(q2, wp)


def blk_floor_f32_folded(xi):
    """floor-round, f32 acc, folded relu6+clip (no separate relu6)."""
    xc = xi.astype(jnp.bfloat16)
    a1 = conv(xc, we, pet=jnp.float32)
    q1 = jnp.clip(jnp.floor(a1 * (sc_e * 2.5) + 0.5), 0, 15) \
        .astype(jnp.bfloat16)
    a2 = conv(q1, wd, (2, 2), groups=CE, pet=jnp.float32)
    q2 = jnp.clip(jnp.floor(a2 * (sc_d * 2.5) + 0.5), 0, 15) \
        .astype(jnp.bfloat16)
    a3 = conv(q2, wp, pet=jnp.float32)
    return (a3 * sc_p).astype(jnp.bfloat16)


for name, fn, arg in [
        ("block floor bf16-acc folded", blk_floor_bf16, x_i),
        ("block floor f32-acc folded", blk_floor_f32_folded, x_i),
]:
    t = time_fn(jax.jit(fn), arg, iters) * 1e3
    print(f"{name:40s} {t:7.3f} ms")


# --- round-2b: epilogue algebra variants (deploy-exact shapes: scale,
# bias, zp, output codes as int8). Hypotheses: (a) the /delta division
# (delta is a DATA arg, XLA cannot reciprocal-fold it) costs real VPU
# time; (b) folding scale/bias/zp into one multiply-add in code space
# (M = s/d, C = b/d + 0.5 + zp) removes two adds and the division.
bias_e = jax.device_put(jax.random.normal(k, (CE,)), tpu)
bias_d = jax.device_put(jax.random.normal(k, (CE,)), tpu)
bias_p = jax.device_put(jax.random.normal(k, (CO,)), tpu)
d_act = jnp.float32(0.37)     # data arg (traced), like act_steps deltas
zp_act = jnp.float32(0.0)


def _epi_current(acc, sc, b, d, zp):
    """deploy today: mul, add bias, DIV delta, +0.5, floor, +zp, clip."""
    y = acc * sc + b
    q = jnp.clip(jnp.floor(y / d + 0.5) + zp, 0.0, 15.0)
    return (q - zp).astype(jnp.int8)


def _epi_recip(acc, sc, b, d, zp):
    """division replaced by reciprocal multiply (1/d hoisted)."""
    inv = 1.0 / d
    y = acc * sc + b
    q = jnp.clip(jnp.floor(y * inv + 0.5) + zp, 0.0, 15.0)
    return (q - zp).astype(jnp.int8)


def _epi_folded(acc, sc, b, d, zp):
    """single multiply-add in code space: M=s/d, C=b/d+0.5+zp."""
    M = sc / d
    C = b / d + 0.5 + zp
    q = jnp.clip(jnp.floor(acc * M + C), 0.0, 15.0)
    return (q - zp).astype(jnp.int8)


def mk_block(epi):
    def blk(xi):
        xc = xi.astype(jnp.bfloat16)
        a1 = conv(xc, we, pet=jnp.float32)
        q1 = epi(a1, sc_e, bias_e, d_act, zp_act).astype(jnp.bfloat16)
        a2 = conv(q1, wd, (2, 2), groups=CE, pet=jnp.float32)
        q2 = epi(a2, sc_d, bias_d, d_act, zp_act).astype(jnp.bfloat16)
        a3 = conv(q2, wp, pet=jnp.float32)
        return a3 * sc_p + bias_p
    return blk


if os.environ.get("PROBE_EPI", "0") == "1":
    for name, epi in [("epi current (div)", _epi_current),
                      ("epi reciprocal mul", _epi_recip),
                      ("epi folded single-FMA", _epi_folded)]:
        t = time_fn(jax.jit(mk_block(epi)), x_i, iters) * 1e3
        print(f"{name:40s} {t:7.3f} ms")
    # numeric check: folded vs current on a grid
    accv = jnp.linspace(-30, 30, 100001, dtype=jnp.float32)
    a = _epi_current(accv, 0.73, 0.2, 0.37, 3.0)
    c = _epi_folded(accv, 0.73, 0.2, 0.37, 3.0)
    print("folded==current frac:", float((a == c).mean()))
