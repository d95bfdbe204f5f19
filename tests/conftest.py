"""Test harness: force an 8-device virtual CPU mesh.

The driver environment pre-imports jax (sitecustomize) with the axon TPU
backend selected via JAX_PLATFORMS=axon, so plain env-var edits are too
late; we must go through jax.config before the first backend use.
Sharding/parallelism tests then see jax.device_count() == 8 without real
hardware, per the multi-chip test strategy (SURVEY.md §4).
"""

import os

# XLA flags are read at (lazy) backend initialization — still early enough.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # 8 virtual devices; generous collective timeouts because all 8 device
    # programs time-share this box's few cores (the default 40 s rendezvous
    # termination aborts the process under contention).
    # concurrency_optimized_scheduler=false: the concurrent thunk scheduler
    # issues independent collectives in device-dependent order, which
    # deadlocks XLA:CPU's blocking in-process rendezvous on small hosts.
    # Sequential per-device issue order keeps SPMD collectives aligned.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_enable_concurrency_optimized_scheduler=false"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (already imported by sitecustomize; reconfigure)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.devices()}")
assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
