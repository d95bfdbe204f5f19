"""Does a background-thread device_put overlap device compute on the axon
tunnel? (round 4, follow-up to transfer_probe.py which showed inline
device_put serializes with the step chain.)

Three arms, same 10-step matmul chain (~11 ms/step resident):
  A. resident payload (baseline);
  B. inline device_put per step (transfer_probe showed +full transfer);
  C. device_put runs in a worker thread one step ahead (the PrefetchLoader
     device_put-hook pattern): main thread consumes the future.

If C ~= A + max(0, transfer - compute), the tunnel client releases the GIL
and transfers overlap -> double-buffered uploads are worth shipping.
If C ~= B, the tunnel serializes all RPCs -> publish the transfer floor.
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[overlap] {msg}", file=sys.stderr, flush=True)


def fetch(x):
    return float(np.asarray(x))


def main():
    mb = 16
    n = mb * (1 << 20) // 4
    host = (np.arange(n) % 251).astype(np.float32)
    m = 4096
    w = jax.device_put(np.eye(m, dtype=np.float32) * 0.9999)

    @jax.jit
    def step(carry, w, payload):
        eps = jnp.sum(payload) * 1e-30
        out = carry
        for _ in range(12):
            out = (out @ w).astype(jnp.bfloat16).astype(jnp.float32)
        return out + eps

    # Heavier step variant (~compute > transfer) to see full hiding.
    @jax.jit
    def step_heavy(carry, w, payload):
        eps = jnp.sum(payload) * 1e-30
        out = carry
        for _ in range(160):
            out = (out @ w).astype(jnp.bfloat16).astype(jnp.float32)
        return out + eps

    carry = jax.device_put(np.ones((m, m), np.float32))
    resident = jax.device_put(host)
    for f in (step, step_heavy):
        carry = f(carry, w, resident)
    fetch(jnp.sum(carry))

    k = 10
    for name, f in (("light", step), ("heavy", step_heavy)):
        t0 = time.perf_counter()
        for _ in range(k):
            carry = f(carry, w, resident)
        fetch(jnp.sum(carry))
        t_a = (time.perf_counter() - t0) * 1e3 / k

        t0 = time.perf_counter()
        for _ in range(k):
            payload = jax.device_put(host)
            carry = f(carry, w, payload)
        fetch(jnp.sum(carry))
        t_b = (time.perf_counter() - t0) * 1e3 / k

        with ThreadPoolExecutor(max_workers=1) as pool:
            t0 = time.perf_counter()
            fut = pool.submit(jax.device_put, host)
            for _ in range(k):
                payload = fut.result()
                fut = pool.submit(jax.device_put, host)
                carry = f(carry, w, payload)
            fetch(jnp.sum(carry))
            t_c = (time.perf_counter() - t0) * 1e3 / k

        log(f"{name} step ({mb} MB payload): resident {t_a:.1f} | "
            f"inline-put {t_b:.1f} | threaded-put {t_c:.1f} ms/step")


if __name__ == "__main__":
    main()
