"""Batch loader: threaded item assembly → fixed-shape global numpy batches.

Replaces the reference's torch DataLoader + DistributedSampler stack
(data_dataloaders.py:18-47): one GLOBAL batch is assembled per step and handed
to the jitted SPMD program, which shards it over the mesh's data axis at the
call boundary — there is no per-rank sampling to reconcile, and the eval-time
id-reordering dance (evaluator.py:173-189) disappears by construction.

Video decode (the reference's worker processes) runs on a thread pool: cv2
releases the GIL inside decode, so threads scale like the reference's workers
without pickling overhead.  A one-batch prefetch overlaps host decode with
device compute.
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from queue import Queue
from typing import Dict, Iterator, Optional

import numpy as np


def _stack(items) -> Dict[str, np.ndarray]:
    keys = items[0].keys()
    return {k: np.stack([it[k] for it in items], axis=0) for k in keys}


class BatchLoader:
    """Iterates fixed-shape global batches over a dataset.

    Args:
      dataset: object with __len__ and item(i) (see datasets/base.py).
      batch_size: GLOBAL batch size.
      shuffle: reshuffle each epoch (seeded, epoch-dependent).
      drop_last: drop the trailing partial batch (train) — eval pads instead
        via `pad_to_batch` so shapes stay static for jit.
      workers: decode threads.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, workers: int = 8, seed: int = 42,
                 pad_to_batch: bool = False, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.workers = max(1, workers)
        self.seed = seed
        self.pad_to_batch = pad_to_batch
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        return order

    def _assemble(self, idxs, pool) -> Dict[str, np.ndarray]:
        items = list(pool.map(self.dataset.item, idxs))
        batch = _stack(items)
        real = len(idxs)
        if self.pad_to_batch and real < self.batch_size:
            pad = self.batch_size - real
            for k, v in batch.items():
                batch[k] = np.concatenate(
                    [v, np.repeat(v[-1:], pad, axis=0)], axis=0)
            # padded rows are marked invalid downstream via `valid`
        batch["valid"] = np.concatenate(
            [np.ones(real, np.bool_),
             np.zeros(batch["idx"].shape[0] - real, np.bool_)])
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n = len(order)
        limit = (n // self.batch_size) * self.batch_size if self.drop_last else n
        slices = [order[i: i + self.batch_size]
                  for i in range(0, limit, self.batch_size)]

        pool = cf.ThreadPoolExecutor(self.workers)
        if self.prefetch <= 0:
            try:
                for s in slices:
                    yield self._assemble(s, pool)
            finally:
                pool.shutdown(wait=False, cancel_futures=True)
            return

        # Early termination is normal (bounded memory-bank fills, benches,
        # generator GC) — the producer must never submit to a shut-down pool
        # or block forever on a full queue, so every put is stop-aware.
        from queue import Full
        q: Queue = Queue(maxsize=self.prefetch)
        stop = object()
        stopping = threading.Event()

        def _put(item) -> bool:
            while not stopping.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except Full:
                    continue
            return False

        def producer():
            try:
                for s in slices:
                    if stopping.is_set():
                        return
                    if not _put(self._assemble(s, pool)):
                        return
            except RuntimeError:   # pool shut down mid-assemble
                return
            finally:
                _put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                yield item
        finally:
            stopping.set()
            t.join()
            pool.shutdown(wait=False, cancel_futures=True)
