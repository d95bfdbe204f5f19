"""Measure the axon tunnel's host<->device transfer costs (round 4).

VERDICT r3 Missing #2/#3: real-data training runs at 16.7 samples/s against
a 149 samples/s chip, and the suspect is the per-step host->device transfer
of a ~50 MB fp32 batch over the tunnel. Before redesigning the wire format,
measure:

  1. per-call floor: dispatch+fetch of a 1-element jit (the "trivial-op
     probe" VERDICT r3 next-step #4 asks for);
  2. h2d bandwidth: device_put of N-MB arrays, execution-forced by fetching
     a scalar computed FROM the transferred buffer (device_put alone may
     return at enqueue on this runtime — PERF_NOTES axon semantics);
  3. d2h bandwidth: fetch of an N-MB computed array;
  4. overlap: does a device_put of batch N+1 proceed while step N runs?
     (chain of K steps, fresh upload per step, vs resident-batch chain);
  5. dtype slope: fp32 vs uint8 payload of the same logical sample.

Run ON the TPU (one process at a time): python experiments/transfer_probe.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(msg):
    print(f"[transfer] {msg}", file=sys.stderr, flush=True)


def fetch(x):
    return float(np.asarray(x))


@jax.jit
def tiny(x):
    return x + 1.0


@jax.jit
def consume(x):
    # Touch every byte so the fetch cannot complete before the full
    # buffer is on device; cast avoids integer-overflow shortcuts.
    return jnp.sum(x.astype(jnp.float32) * 1e-6)


def p50(samples):
    return float(np.percentile(samples, 50))


def measure_floor(reps=30):
    x = np.zeros((1,), np.float32)
    fetch(tiny(jax.device_put(x)))  # warm
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(tiny(jax.device_put(x)))
        lat.append((time.perf_counter() - t0) * 1e3)
    return p50(lat)


def measure_h2d(nbytes, dtype, reps=8):
    n = nbytes // np.dtype(dtype).itemsize
    host = (np.arange(n) % 251).astype(dtype)
    # warm the consume program at this shape
    fetch(consume(jax.device_put(host)))
    # resident-buffer baseline: same compute+fetch, no upload
    resident = jax.device_put(host)
    fetch(consume(resident))
    base = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(consume(resident))
        base.append((time.perf_counter() - t0) * 1e3)
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(consume(jax.device_put(host)))
        lat.append((time.perf_counter() - t0) * 1e3)
    return p50(lat), p50(base)


def measure_d2h(nbytes, reps=8):
    n = nbytes // 4
    resident = jax.device_put((np.arange(n) % 251).astype(np.float32))

    @jax.jit
    def compute(x):
        return x * 1.000001  # same-size computed output

    out = compute(resident)
    np.asarray(out)  # warm
    lat = []
    for _ in range(reps):
        out = compute(resident)
        t0 = time.perf_counter()
        np.asarray(out)
        lat.append((time.perf_counter() - t0) * 1e3)
    return p50(lat)


def measure_overlap(nbytes, step_ms_target=100.0, k=10):
    """K chained matmul 'steps', each consuming a FRESH uploaded buffer,
    vs the same chain consuming one resident buffer. If uploads overlap
    compute, the delta per step is < the blocking upload time."""
    n = nbytes // 4
    host = (np.arange(n) % 251).astype(np.float32)
    # a matmul sized to ~step_ms_target on v5e bf16
    m = 4096
    w = jax.device_put(np.eye(m, dtype=np.float32) * 0.9999)

    @jax.jit
    def step(carry, w, payload):
        # consume the payload so the step depends on the upload
        eps = jnp.sum(payload) * 1e-30
        out = carry
        for _ in range(12):
            out = (out @ w).astype(jnp.bfloat16).astype(jnp.float32)
        return out + eps

    carry = jax.device_put(np.ones((m, m), np.float32))
    resident = jax.device_put(host)
    carry = step(carry, w, resident)
    fetch(jnp.sum(carry))  # warm

    t0 = time.perf_counter()
    for _ in range(k):
        carry = step(carry, w, resident)
    fetch(jnp.sum(carry))
    t_resident = (time.perf_counter() - t0) * 1e3 / k

    t0 = time.perf_counter()
    for _ in range(k):
        payload = jax.device_put(host)
        carry = step(carry, w, payload)
    fetch(jnp.sum(carry))
    t_fresh = (time.perf_counter() - t0) * 1e3 / k
    return t_resident, t_fresh


def main():
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    out = {"device": str(dev)}

    floor = measure_floor()
    out["dispatch_fetch_floor_ms"] = round(floor, 2)
    log(f"per-call floor (1-elem jit dispatch+fetch): {floor:.2f} ms p50")

    for mb in (1, 4, 16, 48):
        tot, base = measure_h2d(mb * 1 << 20, np.float32)
        xfer = max(tot - base, 1e-3)
        bw = mb / (xfer / 1e3)
        out[f"h2d_fp32_{mb}mb_ms"] = round(xfer, 1)
        out[f"h2d_fp32_{mb}mb_mbps"] = round(bw, 1)
        log(f"h2d fp32 {mb:3d} MB: total {tot:7.1f} ms, resident-base "
            f"{base:6.1f} ms -> transfer {xfer:7.1f} ms = {bw:7.1f} MB/s")

    tot, base = measure_h2d(8 << 20, np.uint8)
    out["h2d_uint8_8mb_ms"] = round(max(tot - base, 1e-3), 1)
    log(f"h2d uint8   8 MB: transfer {max(tot - base, 0):.1f} ms")

    for mb in (1, 16, 48):
        d2h = measure_d2h(mb * 1 << 20)
        out[f"d2h_{mb}mb_ms"] = round(d2h, 1)
        log(f"d2h fp32 {mb:3d} MB: {d2h:7.1f} ms = "
            f"{mb / (d2h / 1e3):7.1f} MB/s")

    for mb in (16, 48):
        t_res, t_fresh = measure_overlap(mb * 1 << 20)
        out[f"overlap_{mb}mb_resident_ms"] = round(t_res, 1)
        out[f"overlap_{mb}mb_fresh_ms"] = round(t_fresh, 1)
        log(f"overlap {mb} MB: resident {t_res:.1f} ms/step, fresh-upload "
            f"{t_fresh:.1f} ms/step (delta {t_fresh - t_res:+.1f})")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
