"""Tracing/profiling: per-stage step timing + JAX profiler traces.

The reference has no profiler integration (SURVEY.md §5.1); here step
timing is a first-class metric (the samples/sec/chip north star) and TPU
traces come from jax.profiler on demand.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import numpy as np


class StepTimer:
    """Wall-clock stage timing with percentile summaries.

    Usage:
        timer = StepTimer()
        with timer.stage("data"):   batch = next(it)
        with timer.stage("step"):   state, m = train_step(state, batch)
        timer.summary() -> {"data_p50_ms": ..., "step_p50_ms": ...}
    """

    def __init__(self, window: int = 200):
        self.window = window
        self._samples: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            samples = self._samples[name]
            samples.append((time.perf_counter() - t0) * 1e3)
            if len(samples) > self.window:
                del samples[: len(samples) - self.window]

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, samples in self._samples.items():
            arr = np.asarray(samples)
            out[f"{name}_p50_ms"] = float(np.percentile(arr, 50))
            out[f"{name}_p95_ms"] = float(np.percentile(arr, 95))
            out[f"{name}_mean_ms"] = float(arr.mean())
        return out

    def throughput(self, stage: str, items_per_step: int) -> float:
        samples = self._samples.get(stage)
        if not samples:
            return 0.0
        return items_per_step / (np.mean(samples) / 1e3)


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context (view in TensorBoard / xprof); no-op when
    logdir is None."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
