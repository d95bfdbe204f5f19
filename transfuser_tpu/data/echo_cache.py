"""Rotating-window device cache: augmented training at HBM-gather rate.

The two fast input tiers both force augment=False (device_cache.py holds
ONE frozen decode resident; the disk cache freezes the rotation sampled
at write time), so the training that matters — the reference augments
with ±20° rotations, transfuser.py config + train.py:156-163 — ran at
the 1-core host's decode rate (~40 samples/s vs the chip's ~110+,
PERF_NOTES round 4). The reference's answer is 8 pinned DataLoader
workers on 8 cores; this box has one core, so no host-side scheme can
reach the chip rate.

This loader keeps a WINDOW of freshly-augmented samples resident in HBM
and trains from on-device gathers, while a single background thread
re-decodes dataset samples (fresh augmentation each decode) and the main
loop swaps them in chunk-at-a-time between steps:

  * the window is N_CHUNKS device arrays per key, NOT one — replacing a
    chunk is one device_put + a host-handle rebind (the axon runtime
    ignores donation, so an in-place scatter would copy the whole window
    each refresh; rebinding frees the old generation, PERF_NOTES "axon
    sync semantics" #6),
  * each batch samples one chunk uniformly, then batch_size offsets
    without replacement inside it — chunks are i.i.d. random subsets of
    the dataset, so a batch is an unbiased 64-subset sample,
  * every sample is consumed ~(chip rate / refresh rate) times before
    its slot is re-decoded with a new rotation — the data-echoing
    trade (Choi et al., "Faster Neural Network Training with Data
    Echoing"): repeat-with-reaugmentation instead of starving the chip.
    The achieved echo factor is reported so runs can record it.

Single-process, packed-wire samples (data/pack.py); the train step's
unpack_batch widens the gathered uint8 rows on device.
"""

from __future__ import annotations

import math
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np


class EchoCacheLoader:
    """PrefetchLoader-shaped iterator (set_epoch / __iter__ / __len__)
    yielding device-resident batches gathered from a rotating HBM window
    of augmented samples."""

    def __init__(self, dataset, batch_size: int, window: int = 1024,
                 chunk: int = 64, seed: int = 0, log=None,
                 refresh_queue_depth: int = 2):
        import jax
        import jax.numpy as jnp

        if getattr(dataset, "cache", None):
            raise ValueError("EchoCacheLoader needs an uncached dataset: "
                             "a sample cache would freeze the augmentation "
                             "this loader exists to keep fresh")
        n = len(dataset)
        window = min(window, n)
        chunk = min(chunk, window)
        if batch_size > chunk:
            raise ValueError(f"batch_size {batch_size} exceeds chunk size "
                             f"{chunk}: a batch gathers within one chunk")
        self.dataset = dataset
        self.batch_size = batch_size
        self.chunk = chunk
        self.n_chunks = max(1, window // chunk)
        self.window = self.n_chunks * chunk
        self.seed = seed
        self.epoch = 0
        self.log = log
        self._rng = np.random.default_rng(seed)
        self._consumed = 0            # samples trained on
        self._refreshed = 0           # samples re-decoded into the window

        # ---------------------------------------------------- initial fill
        # Random subset so the first window isn't the dataset's head
        # (routes are stored contiguously; a head window would be one
        # route's frames).
        self._perm: List[int] = list(self._rng.permutation(n))
        self._perm_pos = 0
        self.chunks: List[Dict] = []
        for j in range(self.n_chunks):
            host = self._decode_chunk()
            self.chunks.append({k: jax.device_put(v)
                                for k, v in host.items()})
            if log:
                log(f"echo-cache fill {j + 1}/{self.n_chunks} chunks")
        total = sum(np.prod(v.shape) * v.dtype.itemsize
                    for v in self.chunks[0].values()) * self.n_chunks
        if log:
            log(f"echo-cache resident: {self.window} samples in "
                f"{self.n_chunks} chunks, {total / 1e6:.0f} MB")

        def gather(chunk_store, idx):
            return {k: v[idx] for k, v in chunk_store.items()}

        self._gather = jax.jit(gather)
        self._jnp = jnp
        self._jax = jax

        # ------------------------------------------------ refresh pipeline
        # The thread only DECODES (numpy/cv2, releases the GIL); all
        # device traffic stays on the main thread so the axon tunnel
        # sees a single dispatcher.
        self._fresh: "queue.Queue" = queue.Queue(maxsize=refresh_queue_depth)
        self._stop = threading.Event()
        self._rr = 0  # next chunk slot to replace, round-robin
        self._thread = threading.Thread(target=self._refresh_loop,
                                        daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- decoding
    def _next_index(self) -> int:
        if self._perm_pos >= len(self._perm):
            self._perm = list(self._rng.permutation(len(self.dataset)))
            self._perm_pos = 0
        i = self._perm[self._perm_pos]
        self._perm_pos += 1
        return i

    def _decode_chunk(self) -> Dict[str, np.ndarray]:
        rows = [self.dataset[self._next_index()] for _ in range(self.chunk)]
        return {k: np.stack([r[k] for r in rows]) for k in rows[0]}

    def _refresh_loop(self) -> None:
        while not self._stop.is_set():
            host = self._decode_chunk()
            while not self._stop.is_set():
                try:
                    self._fresh.put(host, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def _maybe_swap(self) -> None:
        try:
            host = self._fresh.get_nowait()
        except queue.Empty:
            return
        self.chunks[self._rr] = {k: self._jax.device_put(v)
                                 for k, v in host.items()}
        self._rr = (self._rr + 1) % self.n_chunks
        self._refreshed += self.chunk

    # -------------------------------------------------------------- iterator
    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        # nominal epoch: one dataset's worth of samples, so LR schedules
        # and per-epoch logging line up with the other loaders
        return len(self.dataset) // self.batch_size

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.default_rng(self.seed + 1000 + self.epoch)
        for _ in range(len(self)):
            self._maybe_swap()
            j = int(rng.integers(self.n_chunks))
            offs = rng.choice(self.chunk, self.batch_size, replace=False)
            self._consumed += self.batch_size
            yield self._gather(self.chunks[j], self._jnp.asarray(offs))

    # ------------------------------------------------------------- lifecycle
    @property
    def echo_factor(self) -> float:
        """Average number of times a window sample is consumed before its
        slot is re-decoded (lower is fresher; 1.0 matches a plain
        loader)."""
        return self._consumed / max(self._refreshed, self.window)

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=5.0)

    def __del__(self):  # best effort; close() is the real API
        try:
            self._stop.set()
        except Exception:
            pass
