"""Benchmark: TransFuser-base training throughput + inference latency on the
local accelerator (one TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": samples/sec/chip, "unit": ..., "vs_baseline": ...}

Baseline note: the reference repo publishes no GPU training-throughput
number (BASELINE.md). The A100 comparison uses an estimated 35 samples/s
for torch TransFuser-base (batch 12, 160x704 RegNetY-032 x2 + 4-scale GPT +
aux decoders, mixed precision) — the driver-side harness owns the real
baseline; vs_baseline here is measured_value / 35.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache across bench invocations
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

A100_BASELINE_SAMPLES_PER_SEC = 35.0


def main() -> None:
    from transfuser_tpu.config import GlobalConfig
    from transfuser_tpu.data.synthetic import synthetic_batch
    from transfuser_tpu.train.trainer import Trainer

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = GlobalConfig()
    trainer = Trainer(cfg, mesh=None, dtype=jnp.bfloat16)
    batch = synthetic_batch(cfg, batch_size)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    t0 = time.perf_counter()
    state = trainer.init_state(batch)
    print(f"[bench] init done in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    # Warmup / compile.
    t0 = time.perf_counter()
    state, m = trainer.train_step(state, batch)
    jax.block_until_ready(m["loss_total"])
    print(f"[bench] train_step compiled in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, m = trainer.train_step(state, batch)
    jax.block_until_ready(m["loss_total"])
    dt = time.perf_counter() - t0
    train_sps = batch_size * n_steps / dt
    print(f"[bench] {n_steps} steps in {dt:.1f}s -> {train_sps:.1f} "
          "samples/s", file=sys.stderr, flush=True)

    # Inference latency (batch 1, forward_ego path). params passed as an
    # argument — closure capture would bake them into the HLO as constants.
    model = trainer.model
    infer_batch = synthetic_batch(cfg, 1, seed=1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def forward(v, rgb, lidar, tp, tpi, speed):
        return model.apply(v, rgb, lidar, tp, tpi, speed,
                           method="forward_ego")

    args = tuple(jnp.asarray(infer_batch[k]) for k in
                 ("rgb", "lidar", "target_point", "target_point_image",
                  "speed"))
    t0 = time.perf_counter()
    jax.block_until_ready(forward(variables, *args))
    print(f"[bench] inference compiled in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        jax.block_until_ready(forward(variables, *args))
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
