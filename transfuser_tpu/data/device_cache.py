"""HBM-resident dataset: upload once, gather batches on device.

The axon tunnel moves ~120 MB/s host->device while the chip trains at
~150 samples/s x ~1 MB packed (PERF_NOTES round-4 transfer probe): a
dataset that fits in HBM should cross the wire ONCE, not once per epoch.
This is the TPU-native analogue of the reference's shared diskcache
(train.py:77-91) — the cache tier is device memory instead of disk, and
the per-step "load" is an on-device gather that XLA fuses ahead of the
train step.

Use with packed samples (data/pack.py) and augment=False — augmentation is
sampled at decode time, so a resident copy would freeze it (the same
constraint the disk/memory cache has, dataset.py). The train step's
unpack_batch widens the gathered uint8 rows on device.

Sizing: packed TransFuser samples are ~0.9 MB -> ~9 GB for a 10k-frame
dataset; the flagship at batch 16 leaves ~8 GB of the v5e's 16 GB free.
`fits(dataset, budget_bytes)` checks before committing.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, Optional

import numpy as np


def sample_nbytes(sample: Dict[str, np.ndarray]) -> int:
    return sum(np.asarray(v).nbytes for v in sample.values())


def fits(dataset, budget_bytes: int) -> bool:
    if len(dataset) == 0:
        return False
    return sample_nbytes(dataset[0]) * len(dataset) <= budget_bytes


class DeviceCacheLoader:
    """Iterator interface matching PrefetchLoader (set_epoch / __iter__ /
    __len__); yields device-resident batch dicts."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 upload_chunk: int = 64, log=None,
                 shard_rank: int = 0, shard_count: int = 1):
        import jax
        import jax.numpy as jnp

        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.shard_rank = shard_rank
        self.shard_count = shard_count
        n = len(dataset)
        # Host-assemble per-key (decode is the slow part on this 1-core
        # box; one big device_put per key rides the tunnel at full
        # bandwidth instead of per-sample RPCs).
        first = dataset[0]
        host: Dict[str, np.ndarray] = {
            k: np.empty((n,) + np.asarray(v).shape, np.asarray(v).dtype)
            for k, v in first.items()}
        for i in range(n):
            s = first if i == 0 else dataset[i]
            for k, v in s.items():
                host[k][i] = v
            if log and (i + 1) % 500 == 0:
                log(f"device-cache decode {i + 1}/{n}")
        total = sum(v.nbytes for v in host.values())
        self.store = {k: jax.device_put(v) for k, v in host.items()}
        self.n = n
        if log:
            log(f"device-cache resident: {n} samples, "
                f"{total / 1e6:.0f} MB uploaded")

        def gather(store, idx):
            return {k: v[idx] for k, v in store.items()}

        self._gather = jax.jit(gather)
        self._jnp = jnp

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = self.n // self.shard_count
        return n // self.batch_size if self.drop_last \
            else math.ceil(n / self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        idx = np.arange(self.n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        idx = idx[self.shard_rank::self.shard_count]
        if self.drop_last:
            idx = idx[:(len(idx) // self.batch_size) * self.batch_size]
        for i in range(0, len(idx), self.batch_size):
            b = idx[i:i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                break
            yield self._gather(self.store, self._jnp.asarray(b))
