"""Multiprocessing batch prefetcher for training.

Counterpart of the reference's `DataLoader(num_workers, worker_init_fn)`
(reference train.py:37-55, framework/utils.py:51-54): sample loading +
augmentation run in SPAWNED worker processes (fork is unsafe once the
multithreaded XLA runtime is up — see the pool construction below; the
dataset is pickled once into each worker via the initializer) ahead of the
consumer, so the accelerator never waits on the host data plane. The
collated `TrainBatch` is assembled in the parent (cheap concatenation of
already-materialized arrays).

Workers reseed their augmentation rng per
(worker, epoch, index) so epochs are reproducible regardless of worker
scheduling — stronger than the reference's per-worker reseed, which made
augmentation depend on which worker picked up which sample.
"""

from __future__ import annotations

import multiprocessing as mp
from typing import Iterator

import numpy as np

from det3d_tpu.config import Config
from det3d_tpu.train.trainer import TrainBatch, host_batch

_WORKER_DS = None


def _init_worker(dataset):
    global _WORKER_DS
    _WORKER_DS = dataset


def _load_one(args) -> dict:
    seed, idx = args
    _WORKER_DS.rng = np.random.RandomState(seed)
    return _WORKER_DS[int(idx)]


class BatchPrefetcher:
    """Iterate TrainBatches with worker-process sample loading.

    Usage:
        pf = BatchPrefetcher(dataset, cfg, num_workers=3, seed=0)
        for batch in pf.epochs():   # infinite, reshuffled per epoch
            ...
    """

    def __init__(
        self,
        dataset,
        cfg: Config,
        num_workers: int,
        *,
        seed: int = 0,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.num_workers = max(int(num_workers), 0)
        self.seed = seed
        self.prefetch = prefetch
        self._pool = None
        if self.num_workers > 0:
            # spawn, not fork: the consumer has usually initialized the JAX
            # backend by the time the first batch is requested, and forking a
            # multithreaded XLA runtime is a documented deadlock hazard. The
            # dataset is pickled once per worker at startup.
            ctx = mp.get_context("spawn")
            self._pool = ctx.Pool(
                self.num_workers, initializer=_init_worker, initargs=(dataset,)
            )

    def _epoch_batches(self, epoch: int) -> Iterator[TrainBatch]:
        rng = np.random.RandomState(self.seed + epoch)
        order = np.arange(len(self.dataset))
        rng.shuffle(order)
        bs = self.cfg.batch_size
        idxs = order[: (len(order) // bs) * bs]
        jobs = [
            ((self.seed * 1_000_003 + epoch * 9_999_991 + int(i)) & 0xFFFFFFFF, i)
            for i in idxs
        ]
        if self._pool is None:
            samples = map(_load_one_local(self.dataset), jobs)
        else:
            samples = self._pool.imap(
                _load_one, jobs, chunksize=max(1, bs // self.num_workers)
            )
        buf = []
        for s in samples:
            buf.append(s)
            if len(buf) == bs:
                yield host_batch(self.cfg, buf)
                buf = []

    def epochs(self) -> Iterator[TrainBatch]:
        epoch = 0
        while True:
            produced = 0
            for batch in self._epoch_batches(epoch):
                produced += 1
                yield batch
            if produced == 0:
                # len(dataset) < batch_size: every epoch truncates to zero
                # batches — erroring beats spinning the while-loop forever
                raise ValueError(
                    f"dataset yields no full batches (len={len(self.dataset)}, "
                    f"batch_size={self.cfg.batch_size})")
            epoch += 1

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _load_one_local(dataset):
    def fn(args):
        seed, idx = args
        dataset.rng = np.random.RandomState(seed)
        return dataset[int(idx)]

    return fn
