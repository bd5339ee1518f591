"""Batch loader with background prefetch.

Replaces the reference's InfiniteDataLoader/worker-process machinery
(reference data/build.py:28-145): on TPU the host assembles padded static
batches on a prefetch thread while the device runs the previous step.
Deterministic per-epoch shuffling via a seeded Generator (reference
seed_worker parity in spirit).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from bsyolo_tpu.data.dataset import YOLODataset


class DataLoader:
    def __init__(
        self,
        dataset: YOLODataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 3,  # reference default seed (cfg/default.yaml:26)
        drop_last: bool = True,
        prefetch: int = 2,
        mosaic: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.mosaic = mosaic
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def close_mosaic(self):
        """Disable mosaic for the final epochs (reference trainer.py:750)."""
        self.mosaic = False

    def _assemble(self, idxs, rng) -> Dict[str, np.ndarray]:
        samples = [self.dataset.get_sample(int(i), rng, mosaic=self.mosaic) for i in idxs]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self.epoch * 1000003)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        nb = len(self)
        batches = [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]
        if not self.drop_last and n % self.batch_size:
            tail = order[nb * self.batch_size :]
            if len(tail):
                # pad the tail batch by wrapping (keeps static shapes)
                pad = order[: self.batch_size - len(tail)]
                batches.append(np.concatenate([tail, pad]))

        if self.prefetch <= 0:
            for idxs in batches:
                yield self._assemble(idxs, rng)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for idxs in batches:
                    q.put(self._assemble(idxs, rng))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
