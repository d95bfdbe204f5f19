"""Threaded prefetching data loader with device prefetch.

Replaces the reference's 8-worker fork-based torch DataLoader
(train.py:156-163) with a thread pool + a device-prefetch queue: while the
accelerator runs step N, batch N+1 is being decoded and transferred
(SURVEY.md §2.9 'dataloader parallelism'). Deterministic per-epoch
shuffling mirrors DistributedSampler.set_epoch (train.py:191-193).
"""

from __future__ import annotations

import heapq
import queue
import random
import threading
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from .dataset import collate


class PrefetchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0,
                 drop_last: bool = True, prefetch: int = 2,
                 device_put: Optional[Callable] = None,
                 shard_rank: int = 0, shard_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.device_put = device_put
        self.shard_rank = shard_rank
        self.shard_count = shard_count
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        idx = idx[self.shard_rank::self.shard_count]  # multi-host split
        if self.drop_last:
            idx = idx[:(len(idx) // self.batch_size) * self.batch_size]
        return [idx[i:i + self.batch_size]
                for i in range(0, len(idx), self.batch_size)]

    def __len__(self) -> int:
        n = len(self.dataset) // self.shard_count
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches()
        task_q: "queue.Queue" = queue.Queue()
        done_q: "queue.Queue" = queue.Queue(
            maxsize=self.prefetch + self.num_workers)
        for pos, b in enumerate(batches):
            task_q.put((pos, b))
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    pos, sample_ids = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    batch = collate([self.dataset[i] for i in sample_ids])
                    if self.device_put is not None:
                        batch = self.device_put(batch)
                except Exception as e:  # surfaced in consumer
                    batch = e
                while not stop.is_set():
                    try:
                        done_q.put((pos, batch), timeout=0.1)
                        break
                    except queue.Full:
                        continue

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        # Reorder out-of-order completions with a min-heap.
        pending: list = []
        next_pos = 0
        try:
            while next_pos < len(batches):
                while not pending or pending[0][0] != next_pos:
                    heapq.heappush(pending, done_q.get())
                _, batch = heapq.heappop(pending)
                if isinstance(batch, Exception):
                    raise batch
                yield batch
                next_pos += 1
        finally:
            stop.set()
