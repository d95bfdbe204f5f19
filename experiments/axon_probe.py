"""Probe the axon TPU runtime's sync/fetch semantics (round-2, VERDICT #1/#2).

Round-1 claims to test:
  * block_until_ready() returns without real execution completing
    (BENCH_r01 implied 219-245% of v5e peak — impossible).
  * Any device->host fetch of a jit-COMPUTED value fails with
    RESOURCE_EXHAUSTED and corrupts subsequent dispatches.

Each phase runs in its own process (a poisoned runtime can't be recovered
in-process). Usage: python experiments/axon_probe.py <phase>
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V5E_BF16_PEAK = 197e12


def log(msg):
    print(f"[probe] {msg}", flush=True)


def attempt(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        log(f"{name}: OK ({time.perf_counter()-t0:.3f}s) -> {out}")
        return True
    except Exception as e:
        log(f"{name}: FAIL ({time.perf_counter()-t0:.3f}s) "
            f"{type(e).__name__}: {str(e)[:500]}")
        return False


def phase_timing():
    """Chained matmuls; implied TFLOP/s vs peak tells if block() blocks."""
    for n in (2048, 4096, 8192):
        x = jnp.ones((n, n), jnp.bfloat16)
        w = jnp.ones((n, n), jnp.bfloat16) * (1.0 / n)

        @jax.jit
        def step(x, w):
            return x @ w

        y = step(x, w)
        jax.block_until_ready(y)
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            y = step(y, w)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        fl = 2 * n**3 * iters
        log(f"matmul n={n}: {dt*1e3/iters:.3f} ms/iter, "
            f"implied {fl/dt/1e12:.1f} TFLOP/s "
            f"({100*fl/dt/V5E_BF16_PEAK:.0f}% of v5e peak)")
    # is_ready latency for one big dispatch
    y2 = step(x, w)
    t0 = time.perf_counter()
    while not y2.is_ready():
        time.sleep(0.0005)
    log(f"is_ready polling after single 8k dispatch: "
        f"{(time.perf_counter()-t0)*1e3:.3f} ms")


def phase_tinyfetch():
    """Fetch tiny computed values through every available path."""
    x = jnp.float32(1.0)
    attempt("fetch device_put input", lambda: float(jax.device_get(x)))
    y = jax.jit(lambda v: v + 1)(x)
    attempt("block tiny computed", lambda: jax.block_until_ready(y))
    attempt("fetch tiny computed (device_get)",
            lambda: float(jax.device_get(y)))
    attempt("fetch tiny computed (np.asarray)", lambda: float(np.asarray(y)))

    z = jax.jit(lambda v: (v * 2).sum())(jnp.ones((128, 128)))
    attempt("fetch computed reduction", lambda: float(z))

    def async_fetch():
        w = jax.jit(lambda v: v + 3)(x)
        w.copy_to_host_async()
        time.sleep(0.5)
        return float(np.asarray(w))
    attempt("copy_to_host_async then read", async_fetch)
    # after all that, is the stream poisoned for new dispatches?
    attempt("post-fetch new dispatch",
            lambda: jax.block_until_ready(jax.jit(lambda v: v * 5)(x)))


def phase_queue():
    """Does fetch failure depend on outstanding queue depth?"""
    n = 4096
    w = jnp.ones((n, n), jnp.bfloat16) * (1.0 / n)

    @jax.jit
    def step(y, w):
        return y @ w

    for depth in (0, 1, 8, 32):
        y = jnp.ones((n, n), jnp.bfloat16)
        y = step(y, w)
        jax.block_until_ready(y)
        for _ in range(depth):
            y = step(y, w)
        ok = attempt(f"fetch after depth={depth}",
                     lambda: float(np.asarray(y)[0, 0]))
        if not ok:
            log("stopping phase_queue early (stream may be poisoned)")
            break
        attempt(f"redispatch after depth={depth} fetch",
                lambda: jax.block_until_ready(step(y, w)))


def phase_trainfetch():
    """The real question: fetch a loss computed by the FULL train step."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from transfuser_tpu.config import GlobalConfig
    from transfuser_tpu.data.synthetic import synthetic_batch
    from transfuser_tpu.train.trainer import Trainer

    cfg = GlobalConfig()
    trainer = Trainer(cfg, dtype=jnp.bfloat16)
    batch = {k: jnp.asarray(v)
             for k, v in synthetic_batch(cfg, 8).items()}
    t0 = time.perf_counter()
    state = trainer.init_state(batch)
    jax.block_until_ready(state.params)
    log(f"init in {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    state, metrics = trainer.train_step(state, batch)
    jax.block_until_ready(metrics["loss_total"])
    log(f"step1 (compile) in {time.perf_counter()-t0:.1f}s")
    for i in range(5):
        state, metrics = trainer.train_step(state, batch)
        jax.block_until_ready(metrics["loss_total"])
    attempt("fetch loss after 6 steps",
            lambda: float(np.asarray(metrics["loss_total"])))
    attempt("redispatch after loss fetch", lambda: jax.block_until_ready(
        trainer.train_step(state, batch)[1]["loss_total"]))
    # fetch again a few steps later
    for i in range(3):
        state, metrics = trainer.train_step(state, batch)
        jax.block_until_ready(metrics["loss_total"])
    attempt("fetch loss after 3 more steps",
            lambda: float(np.asarray(metrics["loss_total"])))


PHASES = {f[len("phase_"):]: globals()[f]
          for f in list(globals()) if f.startswith("phase_")}

if __name__ == "__main__":
    name = sys.argv[1]
    log(f"=== phase {name} on {jax.devices()} jax {jax.__version__} ===")
    PHASES[name]()
    log(f"=== phase {name} done ===")
