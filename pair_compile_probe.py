"""Minimal repro probe for the pair-transport XLA:TPU compile hang.

The first mnasnet deploy graph containing the n-term code-sum conv
decomposition (deploy.py 'pair' value form) wedged the remote axon
compile service for >1h (2026-08-18). This isolates the suspected
structure: a chain of N siteless inverted-residual blocks where every
block's output is carried as (proj_codes, residual_codes...) terms and
the NEXT block's expand conv runs one bf16-code conv per term.

Run with increasing N and per-stage term counts; each jit is compiled
with a watchdog so a hang is reported (and the script exits) rather
than blocking forever.

Usage: python pair_compile_probe.py [max_blocks]
Env: PROBE_TERMS=2|3 (term cap), BENCH_BATCH (default 64).
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache_axon", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_axon")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B = int(os.environ.get("BENCH_BATCH", 64))
TERMS = int(os.environ.get("PROBE_TERMS", 3))
H, CI, CE = 28, 32, 96
MAXN = int(sys.argv[1]) if len(sys.argv) > 1 else 8

cpu = jax.local_devices(backend="cpu")[0]
tpu = jax.devices()[0]
k = jax.random.PRNGKey(0)
with jax.default_device(cpu):
    x0 = jax.random.randint(k, (B, H, H, CI), -8, 8, jnp.int8)
    we = jax.random.randint(k, (1, 1, CI, CE), -2, 2, jnp.int8)
    wd = jax.random.randint(k, (5, 5, 1, CE), -2, 2, jnp.int8)
    wp = jax.random.randint(k, (1, 1, CE, CI), -2, 2, jnp.int8)
x0, we, wd, wp = (jax.device_put(t, tpu) for t in (x0, we, wd, wp))
dn = ("NHWC", "HWIO", "NHWC")


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=jnp.float32)


def quant(y, d):
    return jnp.clip(jnp.floor(y * (1.0 / d) + 0.5), -8, 7).astype(jnp.int8)


def chain(n_blocks):
    def f(x):
        terms = [(x, jnp.float32(0.37))]          # (codes, delta)
        for i in range(n_blocks):
            # expand conv: one code conv per term (the pair decomposition)
            acc = None
            for tc, d in terms:
                t = conv(tc, we) * d
                acc = t if acc is None else acc + t
            q1 = quant(acc * 0.11, 0.41)
            q2 = quant(conv(q1, wd, groups=CE) * 0.13, 0.39)
            pj = quant(conv(q2, wp) * 0.12, 0.43)
            terms = ([(pj, jnp.float32(0.43))] + terms)[:TERMS]
        out = None
        for tc, d in terms:
            t = tc.astype(jnp.float32) * d
            out = t if out is None else out + t
        return out.sum()
    return f


def timed_compile(n, timeout_s=600):
    done = []

    def work():
        t0 = time.time()
        v = float(jax.jit(chain(n))(x0))
        done.append((time.time() - t0, v))

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_s)
    if not done:
        print(f"blocks={n:2d} terms<={TERMS}  HANG (> {timeout_s}s)",
              flush=True)
        return False
    dt, v = done[0]
    print(f"blocks={n:2d} terms<={TERMS}  compile+run {dt:7.1f}s  v={v:.1f}",
          flush=True)
    return True


n = 1
while n <= MAXN:
    if not timed_compile(n):
        sys.exit(1)
    n *= 2
print("no hang up to", MAXN)
