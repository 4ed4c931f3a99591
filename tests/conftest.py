"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip code paths are validated with XLA host-platform device faking
(the reference has no multi-node test story at all — SURVEY.md §4.7); the
driver separately dry-runs the sharded path via __graft_entry__.py.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Deploy tests assert deploy == sim parity, so the suite pins the exact
# 2-pass stem (the serving default is the 1-pass bf16 stem, whose 2^-9
# activation rounding is harmless on realistic grids but chaotic on the
# tiny random-weight W4A4 fixtures used here). test_deploy has a
# dedicated 1-pass-mode test.
os.environ.setdefault("SSQ_STEM_1PASS", "0")

import jax  # noqa: E402

# The axon sitecustomize force-registers the remote TPU platform and
# programmatically sets jax_platforms='axon,cpu', overriding the env var —
# override it back AFTER import so tests run on local CPU devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: this CPU is slow at XLA compilation; cache makes
# repeat test runs cheap.
# separate cache dir per platform: remote-compiled TPU/AOT blobs are not
# loadable by the host CPU (machine-feature mismatch)
os.makedirs("/tmp/jax_cache_cpu", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
