"""Benchmark: TransFuser-base training throughput + inference latency on the
local accelerator (one TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": samples/sec/chip, "unit": ..., "vs_baseline": ...}

Implementation notes:
  * The training loop is the split grad/update pipeline (two jitted device
    programs chained without host sync — see train/trainer.py and
    PERF_NOTES.md).
  * No computed value is fetched device->host until all timed loops are
    done: the axon tunnel runtime deterministically corrupts subsequent
    dispatches after a mid-stream scalar fetch (PERF_NOTES.md).
  * Baseline: the reference repo publishes no GPU training throughput
    (BASELINE.md); vs_baseline divides by an assumed 35 samples/s for torch
    TransFuser-base on A100 (batch 12, mixed precision).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

try:  # persistent compile cache across bench invocations
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

A100_BASELINE_SAMPLES_PER_SEC = 35.0


def log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    from transfuser_tpu.config import GlobalConfig
    from transfuser_tpu.data.synthetic import synthetic_batch
    from transfuser_tpu.models import LidarCenterNet
    from transfuser_tpu.train import losses as L
    from transfuser_tpu.train.train_state import make_optimizer

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = GlobalConfig()
    model = LidarCenterNet(cfg, dtype=jnp.bfloat16)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_batch(cfg, batch_size).items()}

    t0 = time.perf_counter()
    variables = jax.jit(lambda r, b: model.init(
        r, b["rgb"], b["lidar"], b["target_point"],
        b["target_point_image"], b["speed"], train=False))(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, batch)
    tx = make_optimizer(cfg)
    opt_state = jax.jit(tx.init)(variables["params"])
    jax.block_until_ready(opt_state)
    log(f"init done in {time.perf_counter() - t0:.1f}s")

    def grad_fn(params, batch_stats, step, b):
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed), step)

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                b["rgb"], b["lidar"], b["target_point"],
                b["target_point_image"], b["speed"], train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            det = L.compute_losses(out, b, cfg)
            return L.total_loss(det, cfg), mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        return grads, loss, mut["batch_stats"]

    def update_fn(grads, o, p, step):
        updates, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o2, step + 1

    grad_jit = jax.jit(grad_fn)
    update_jit = jax.jit(update_fn)

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    step = jnp.zeros((), jnp.int32)

    # Warmup / compile (no value fetches).
    t0 = time.perf_counter()
    grads, loss, batch_stats = grad_jit(params, batch_stats, step, batch)
    params, opt_state, step = update_jit(grads, opt_state, params, step)
    jax.block_until_ready(loss)
    log(f"train step compiled in {time.perf_counter() - t0:.1f}s")

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        grads, loss, batch_stats = grad_jit(params, batch_stats, step, batch)
        params, opt_state, step = update_jit(grads, opt_state, params, step)
        jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    train_sps = batch_size * n_steps / dt
    log(f"{n_steps} steps in {dt:.1f}s -> {train_sps:.1f} samples/s")

    # Inference latency (batch 1, forward_ego; params passed as args).
    infer_batch = synthetic_batch(cfg, 1, seed=1)
    infer_vars = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def forward(v, rgb, lidar, tp, tpi, speed):
        return model.apply(v, rgb, lidar, tp, tpi, speed,
                           method="forward_ego")

    args = tuple(jnp.asarray(infer_batch[k]) for k in
                 ("rgb", "lidar", "target_point", "target_point_image",
                  "speed"))
    t0 = time.perf_counter()
    jax.block_until_ready(forward(infer_vars, *args))
    log(f"inference compiled in {time.perf_counter() - t0:.1f}s")
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        jax.block_until_ready(forward(infer_vars, *args))
        lat.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(lat, 50))

    result = {
        "metric": "train samples/sec/chip (TransFuser-base); "
                  "p50 per-frame inference latency",
        "value": round(train_sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(train_sps / A100_BASELINE_SAMPLES_PER_SEC, 3),
        "p50_inference_ms": round(p50, 2),
        "batch_size": batch_size,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
