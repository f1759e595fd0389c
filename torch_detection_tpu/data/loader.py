"""Data loader: sampler + collate + background prefetch, torch-free.

Parity surface: reference ``datasets/loader/build_dataloader.py:16-47``
(TCGGroup/Torch_Detection): sampler choice on the ``dist`` flag and
batch-size computation.  The reference rides torch's worker processes; here
the loader is a plain python iterable with a background prefetch thread
(decode/augment overlap with device compute) and an optional
``jax.device_put`` hook with mesh sharding — host->HBM transfer happens once
per batch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence, Tuple

from .collate import collate
from .sampler import DistributedGroupSampler, GroupSampler


class DataLoader:
    """Iterates fixed-shape batches; call ``set_epoch`` between epochs for
    the deterministic per-epoch shuffle (reference ``set_epoch`` semantics)."""

    def __init__(
        self,
        dataset,
        sampler,
        batch_size: int,
        collate_fn: Callable,
        prefetch: int = 2,
        drop_last: bool = False,
        workers: int = 0,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self.drop_last = drop_last
        # ``workers`` > 0 decodes samples through a thread pool — the analog
        # of the reference's ``workers_per_gpu`` worker *processes*
        # (build_dataloader.py:8-13,39-46).  Threads suffice here because the
        # decode path is cv2 + numpy, which release the GIL for the heavy
        # work (tests/test_pipeline.py proves the release empirically), so
        # the pool scales across host cores without pickling the dataset or
        # paying process startup/IPC.  Sample order is preserved (in-order
        # future completion), so determinism matches workers=0 exactly.
        self.workers = workers

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _samples(self, skip_indices: int = 0) -> Iterator:
        # ``skip_indices`` drops sampler indices WITHOUT decoding them — the
        # mid-epoch resume path (sampler order is deterministic per epoch, so
        # skipping k*batch_size indices re-synchronizes to batch k exactly).
        it = iter(self.sampler)
        for _ in range(skip_indices):
            next(it, None)
        if self.workers <= 0:
            for idx in it:
                yield self.dataset[int(idx)]
            return
        # bounded sliding window of futures: at most ~2x workers samples
        # in flight (ThreadPoolExecutor.map would eagerly submit the whole
        # epoch), results consumed in submission order
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        window = 2 * self.workers
        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            pending: deque = deque()
            try:
                for idx in it:
                    pending.append(ex.submit(self.dataset.__getitem__, int(idx)))
                    if len(pending) >= window:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
            finally:
                for f in pending:
                    f.cancel()

    def _produce(self, skip_batches: int = 0) -> Iterator:
        buf = []
        for sample in self._samples(skip_indices=skip_batches * self.batch_size):
            buf.append(sample)
            if len(buf) == self.batch_size:
                yield self.collate_fn(buf)
                buf = []
        if buf and not self.drop_last:
            yield self.collate_fn(buf)

    def __iter__(self) -> Iterator:
        yield from self.iter_batches(0)

    def iter_batches(self, skip_batches: int = 0) -> Iterator:
        """Iterate the epoch starting at batch ``skip_batches`` (mid-epoch
        resume): the skipped batches' samples are never decoded."""
        if self.prefetch <= 0:
            yield from self._produce(skip_batches)
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error = []

        def worker():
            try:
                for item in self._produce(skip_batches):
                    q.put(item)
            except BaseException as e:  # propagate into the consumer
                error.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item


def build_dataloader(
    dataset,
    sample_per_replica: int = 2,
    num_replicas: Optional[int] = None,
    rank: Optional[int] = None,
    dist: bool = False,
    seed: int = 0,
    max_gts: int = 100,
    canvas: Optional[Tuple[int, int]] = None,
    canvas_buckets: Optional[Sequence[Tuple[int, int]]] = None,
    size_divisor: int = 32,
    prefetch: int = 2,
    workers: int = 0,
    s2d: bool = False,
    max_proposals: Optional[int] = None,
    collate_fn: Optional[Callable] = None,
) -> DataLoader:
    """Build a loader with grouped (or distributed grouped) sampling.

    ``dist=True`` shards the epoch across ``jax.process_count()`` hosts; the
    on-host batch is ``sample_per_replica`` (each host feeds its own chips
    via mesh sharding — there is no single-process multi-GPU batch-size
    multiplication like the reference's ``num_gpus x sample_per_gpu``).
    """
    if dist:
        sampler = DistributedGroupSampler(
            dataset, sample_per_replica, num_replicas=num_replicas, rank=rank, seed=seed
        )
    else:
        sampler = GroupSampler(dataset, sample_per_replica, seed=seed)

    if collate_fn is None:
        def collate_fn(samples):
            return collate(
                samples,
                max_gts=max_gts,
                canvas=canvas,
                canvas_buckets=canvas_buckets,
                size_divisor=size_divisor,
                s2d=s2d,
                max_proposals=max_proposals,
            )

    return DataLoader(
        dataset,
        sampler,
        batch_size=sample_per_replica,
        collate_fn=collate_fn,
        prefetch=prefetch,
        workers=workers,
    )
