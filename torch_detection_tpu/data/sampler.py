"""Aspect-ratio-grouped batch samplers (single-host and distributed).

Parity surface: reference ``datasets/loader/dataset_sampler.py`` (TCGGroup/
Torch_Detection): GroupSampler (shuffle within aspect group, pad each group
to a batch multiple, permute whole batches, ``:10-66``) and
DistributedGroupSampler (epoch-seeded deterministic shuffle, per-group pad to
``sample_per_replica x num_replicas``, batch permute, contiguous per-rank
slice, ``set_epoch``; ``:69-179``).

TPU-native differences: rank/world size come from ``jax.process_index()`` /
``jax.process_count()`` instead of ``torch.distributed``; all shuffles use a
seeded ``np.random.Generator`` so every host computes the identical global
order and takes a disjoint slice — the property that makes multi-host input
pipelines reproducible.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np


class GroupSampler:
    """Batches are homogeneous in aspect-ratio group to minimize pad waste
    (padding is wasted TPU FLOPs: every padded pixel still runs the convs)."""

    def __init__(self, dataset, sample_per_replica: int = 1, seed: int = 0):
        self.test_mode = getattr(dataset, "test_mode", False)
        self.dataset = dataset
        self.sample_per_replica = sample_per_replica
        self.seed = seed
        self.epoch = 0
        if self.test_mode:
            assert sample_per_replica == 1
            self.num_samples = len(dataset)
        else:
            assert hasattr(dataset, "flag")
            self.flag = dataset.flag.astype(np.int64)
            self.group_sizes = np.bincount(self.flag)
            self.num_samples = int(
                sum(
                    int(np.ceil(s / sample_per_replica)) * sample_per_replica
                    for s in self.group_sizes
                )
            )

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        if self.test_mode:
            return iter(range(len(self.dataset)))
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch]))
        chunks: List[np.ndarray] = []
        for i, size in enumerate(self.group_sizes):
            if size == 0:
                continue
            idx = np.where(self.flag == i)[0]
            rng.shuffle(idx)
            pad_to = int(np.ceil(size / self.sample_per_replica)) * self.sample_per_replica
            chunks.append(np.resize(idx, pad_to))  # cyclic repeat when pad > size
        indices = np.concatenate(chunks)
        batches = indices.reshape(-1, self.sample_per_replica)
        batches = batches[rng.permutation(len(batches))]
        out = batches.reshape(-1)
        assert len(out) == self.num_samples
        return iter(out.tolist())


class DistributedGroupSampler:
    """Per-process shard of the grouped order.

    Every process computes the identical epoch-seeded global batch order and
    takes the contiguous slice ``[rank*num_samples, (rank+1)*num_samples)``
    — the reference's sharding rule (``dataset_sampler.py:170-171``), keyed
    on ``jax.process_index()``.
    """

    def __init__(
        self,
        dataset,
        sample_per_replica: int = 1,
        num_replicas: Optional[int] = None,
        rank: Optional[int] = None,
        seed: int = 0,
    ):
        if num_replicas is None or rank is None:
            import jax

            num_replicas = num_replicas if num_replicas is not None else jax.process_count()
            rank = rank if rank is not None else jax.process_index()
        assert 0 <= rank < num_replicas

        self.test_mode = getattr(dataset, "test_mode", False)
        self.dataset = dataset
        self.sample_per_replica = sample_per_replica
        self.num_replicas = num_replicas
        self.rank = rank
        self.seed = seed
        self.epoch = 0

        if self.test_mode:
            assert sample_per_replica == 1
            self.num_samples = int(np.ceil(len(dataset) / num_replicas))
        else:
            assert hasattr(dataset, "flag")
            self.flag = dataset.flag.astype(np.int64)
            self.group_sizes = np.bincount(self.flag)
            self.num_samples = int(
                sum(
                    int(np.ceil(s / sample_per_replica / num_replicas)) * sample_per_replica
                    for s in self.group_sizes
                )
            )
        self.total_size = self.num_samples * self.num_replicas

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, self.epoch]))
        if self.test_mode:
            indices = list(range(len(self.dataset)))
            indices += indices[: self.total_size - len(indices)]
            assert len(indices) == self.total_size
            # strided subsample in test mode (keeps original eval order per rank)
            shard = indices[self.rank : self.total_size : self.num_replicas]
            assert len(shard) == self.num_samples
            return iter(shard)

        chunks: List[np.ndarray] = []
        for i, size in enumerate(self.group_sizes):
            if size == 0:
                continue
            idx = np.where(self.flag == i)[0]
            idx = idx[rng.permutation(int(size))]
            pad_to = (
                int(np.ceil(size / self.sample_per_replica / self.num_replicas))
                * self.sample_per_replica
                * self.num_replicas
            )
            chunks.append(np.resize(idx, pad_to))  # cyclic repeat when pad > size
        indices = np.concatenate(chunks)
        assert len(indices) == self.total_size
        batches = indices.reshape(-1, self.sample_per_replica)
        batches = batches[rng.permutation(len(batches))]
        flat = batches.reshape(-1)
        offset = self.num_samples * self.rank
        shard = flat[offset : offset + self.num_samples]
        assert len(shard) == self.num_samples
        return iter(shard.tolist())
