"""Batch loader with background prefetch, worker processes, and host sharding.

Replaces the reference's InfiniteDataLoader/worker-process machinery
(reference data/build.py:28-145): the host assembles padded static batches
while the device runs the previous step. Three feeding modes:

- ``workers=0`` (default): one background prefetch thread.
- ``workers=N``: a fork-based process pool assembles batches in parallel
  (the analog of torch DataLoader ``num_workers``, reference build.py:127);
  augmentation randomness is derived per (seed, epoch, batch_index) so the
  stream is identical regardless of worker count.
- ``shard=(rank, world)``: multi-host data parallelism — every host shuffles
  with the shared seed, then takes a strided slice of the epoch order (the
  DistributedSampler analog, reference build.py:127-145). ``batch_size`` is
  the per-host batch.
"""

from __future__ import annotations

import multiprocessing
import os
import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from bsyolo_tpu.data.dataset import YOLODataset

_WORKER_LOADER = None


def _worker_init(loader):
    global _WORKER_LOADER
    _WORKER_LOADER = loader


def _worker_assemble(args):
    # epoch/mosaic ride along with each job: the pool persists across epochs
    # (fork cost is paid once, not per epoch), so worker-side loader state
    # would otherwise be frozen at fork time.
    bi, idxs, epoch, mosaic = args
    ld = _WORKER_LOADER
    return ld._assemble(idxs, np.random.default_rng([ld.seed, epoch, bi]), mosaic=mosaic)


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
        workers: int = 0,
        shard: Optional[Tuple[int, int]] = None,
        rect: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.mosaic = mosaic
        # clamp to usable cores (reference build.py:117 nw = min(cpu//nd,
        # workers)): oversubscribed fork workers on a small host collapse
        # throughput (measured 25 -> 1.5 img/s going 1 -> 4 workers on 1 core)
        try:
            usable = len(os.sched_getaffinity(0))
        except AttributeError:  # non-Linux
            usable = os.cpu_count() or 1
        # on a 1-core host a worker process adds only IPC cost over the
        # in-process prefetch thread (measured 25 vs 43 img/s) -> workers=0
        self.workers = min(workers, usable if usable > 1 else 0) if workers > 0 else workers
        self.shard = shard
        # rect (val-only): group images into THREE static aspect buckets
        # (wide / square / tall) so letterboxing pads less — the TPU-native
        # form of the reference's rect=True (build.py:127 rect batching),
        # which there produces per-batch dynamic shapes. Three canvases =
        # three cached XLA programs; ~25% fewer pixels on 4:3 datasets.
        # rect requires deterministic order and (for now) a single host —
        # the bucketed batches ignore the shard stride
        self.rect = rect and not shuffle and shard is None
        self.epoch = 0
        self._pool = None

    def _get_pool(self):
        """Persistent fork pool, created on first use and reused across
        epochs — forking the (JAX-loaded, multi-GB) parent per epoch costs
        more than assembling a small epoch's batches."""
        if self._pool is None:
            ctx = multiprocessing.get_context("fork")
            self._pool = ctx.Pool(self.workers, initializer=_worker_init, initargs=(self,))
        return self._pool

    def close(self):
        """Tear down the worker pool (idempotent)."""
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _epoch_order(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self.epoch * 1000003)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        if self.shard is not None:
            rank, world = self.shard
            # pad by wrapping so every host sees the same number of batches
            pad = (-n) % world
            if pad:
                order = np.concatenate([order, order[:pad]])
            order = order[rank::world]
        return order

    def __len__(self):
        if self.rect:
            return len(self._rect_batches())
        n = len(self._epoch_order()) if self.shard is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def close_mosaic(self):
        """Disable mosaic for the final epochs (reference trainer.py:750)."""
        self.mosaic = False

    def _assemble(self, idxs, rng, mosaic: Optional[bool] = None) -> Dict[str, np.ndarray]:
        mosaic = self.mosaic if mosaic is None else mosaic
        idxs = np.asarray(idxs)
        src = np.where(idxs < 0, -idxs - 1, idxs)  # decode wrap-pad sentinels
        samples = [self.dataset.get_sample(int(i), rng, mosaic=mosaic) for i in src]
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        if not self.drop_last:
            batch["im_idx"] = np.where(idxs < 0, -1, idxs).astype(np.int64)
        return batch

    def _batches(self) -> list:
        order = self._epoch_order()
        n = len(order)
        nb = n // self.batch_size
        batches = [order[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]
        if not self.drop_last and n % self.batch_size:
            tail = order[nb * self.batch_size :]
            if len(tail):
                # pad the tail batch by wrapping (keeps static shapes);
                # wrapped rows are encoded NEGATIVE (-(idx+1)) so _assemble
                # can mark them im_idx=-1 — downstream metric/json/txt
                # consumers skip the duplicates instead of double-counting
                # np.resize repeats order when the dataset itself is smaller
                # than the pad (n < batch_size - len(tail)) — a single wrap
                # would come up short and break static-shape consumers
                pad = np.resize(order, self.batch_size - len(tail))
                batches.append(np.concatenate([tail, -(pad + 1)]))
        return batches

    def _rect_batches(self):
        """[(src_idxs, im_idx, (h, w)), ...] — batches grouped by aspect
        bucket. Tail batches wrap within their bucket; wrapped rows carry
        im_idx -1 so json/txt writers skip the duplicates."""
        shapes = self.dataset.image_shapes()
        imgsz = self.dataset.imgsz
        short = max(32, int(np.floor(imgsz * 0.75 / 32)) * 32)  # 640 -> 480
        canvases = ((short, imgsz), (imgsz, imgsz), (imgsz, short))  # wide/square/tall
        ar = shapes[:, 0] / np.maximum(shapes[:, 1], 1)
        key = np.where(ar < 0.85, 0, np.where(ar > 1.18, 2, 1))
        out = []
        for b in range(3):
            idxs = np.nonzero(key == b)[0]
            if not len(idxs):
                continue
            for s in range(0, len(idxs), self.batch_size):
                chunk = idxs[s : s + self.batch_size]
                pad = self.batch_size - len(chunk)
                if pad:
                    src = np.concatenate([chunk, np.resize(idxs, pad)])
                    im_idx = np.concatenate([chunk, -np.ones(pad, np.int64)])
                else:
                    src, im_idx = chunk, chunk.astype(np.int64)
                out.append((src, im_idx, canvases[b]))
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.rect:
            # sequential assembly (val-only path; the three canvas shapes
            # each compile once on first use)
            for bi, (src, im_idx, canvas) in enumerate(self._rect_batches()):
                rng = np.random.default_rng([self.seed, self.epoch, bi])
                samples = [
                    self.dataset.get_sample(int(i), rng, mosaic=False, shape=canvas)
                    for i in src
                ]
                batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
                batch["im_idx"] = np.asarray(im_idx, np.int64)
                yield batch
            return
        batches = self._batches()

        if self.workers > 0:
            pool = self._get_pool()
            # bounded in-flight window (2x workers) so assembled batches
            # never pile up in the parent when the device step is slower
            # than the assemblers (imap has no output backpressure: a
            # ~75 MB batch x hundreds queued = host OOM)
            window = self.workers * 2
            pending = []
            items = [(bi, idxs, self.epoch, self.mosaic) for bi, idxs in enumerate(batches)]
            for job in items[:window]:
                pending.append(pool.apply_async(_worker_assemble, (job,)))
            next_submit = window
            while pending:
                yield pending.pop(0).get()
                if next_submit < len(items):
                    pending.append(pool.apply_async(_worker_assemble, (items[next_submit],)))
                    next_submit += 1
            return

        if self.prefetch <= 0:
            for bi, idxs in enumerate(batches):
                yield self._assemble(idxs, np.random.default_rng([self.seed, self.epoch, bi]))
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for bi, idxs in enumerate(batches):
                    q.put(self._assemble(idxs, np.random.default_rng([self.seed, self.epoch, bi])))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
