"""Sampler / collate / loader tests (reference semantics per SURVEY.md §4(e):
epoch-seeded determinism, per-rank disjointness + coverage, group homogeneity)."""

import numpy as np
import pytest

pytestmark = pytest.mark.core

from data_fixtures import make_coco
from torch_detection_tpu.data import (
    CocoDataset,
    DistributedGroupSampler,
    GroupSampler,
    build_dataloader,
    collate,
    pick_canvas,
)


class FakeGroupedDataset:
    """flag-only stand-in for sampler tests."""

    def __init__(self, flags):
        self.flag = np.asarray(flags, np.uint8)
        self.test_mode = False

    def __len__(self):
        return len(self.flag)


@pytest.fixture(scope="module")
def coco_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco_pipe"))
    ann_file, img_dir = make_coco(root)
    return CocoDataset(
        ann_file=ann_file,
        img_prefix=img_dir,
        img_means=(0, 0, 0),
        img_stds=(1, 1, 1),
        img_expected_sizes=(100, 60),
        size_divisor=32,
    )


class TestGroupSampler:
    def test_batches_are_group_homogeneous(self):
        ds = FakeGroupedDataset([0] * 7 + [1] * 5)
        s = GroupSampler(ds, sample_per_replica=4)
        idx = list(iter(s))
        assert len(idx) == len(s) == 8 + 8  # both groups padded to mult of 4
        for b in range(len(idx) // 4):
            batch = idx[b * 4 : (b + 1) * 4]
            flags = {ds.flag[i] for i in batch}
            assert len(flags) == 1

    def test_epoch_determinism(self):
        ds = FakeGroupedDataset([0] * 6 + [1] * 6)
        s1 = GroupSampler(ds, 2, seed=7)
        s2 = GroupSampler(ds, 2, seed=7)
        assert list(iter(s1)) == list(iter(s2))
        s1.set_epoch(1)
        assert list(iter(s1)) != list(iter(s2))

    def test_coverage(self):
        ds = FakeGroupedDataset([0] * 5 + [1] * 3)
        s = GroupSampler(ds, 2)
        assert set(iter(s)) == set(range(8))


class TestDistributedGroupSampler:
    def test_disjoint_and_covering(self):
        ds = FakeGroupedDataset([0] * 9 + [1] * 6)
        shards = [
            list(iter(DistributedGroupSampler(ds, 2, num_replicas=4, rank=r, seed=1)))
            for r in range(4)
        ]
        lens = {len(s) for s in shards}
        assert len(lens) == 1  # equal shard sizes
        all_idx = [i for s in shards for i in s]
        # every index appears (padding may duplicate), and shards are
        # batch-aligned slices of one global permutation
        assert set(all_idx) == set(range(15))

    def test_same_global_order_across_ranks(self):
        ds = FakeGroupedDataset([0] * 8)
        # rank r slice of the same epoch-seeded order == concatenation check
        full = []
        for r in range(2):
            full += list(iter(DistributedGroupSampler(ds, 2, num_replicas=2, rank=r, seed=5)))
        s0 = DistributedGroupSampler(ds, 2, num_replicas=2, rank=0, seed=5)
        s1 = DistributedGroupSampler(ds, 2, num_replicas=2, rank=1, seed=5)
        assert full == list(iter(s0)) + list(iter(s1))

    def test_set_epoch_changes_order(self):
        ds = FakeGroupedDataset([0] * 8)
        s = DistributedGroupSampler(ds, 2, num_replicas=2, rank=0, seed=0)
        e0 = list(iter(s))
        s.set_epoch(3)
        assert list(iter(s)) != e0

    def test_batch_homogeneity(self):
        ds = FakeGroupedDataset([0] * 6 + [1] * 6)
        for r in range(3):
            s = DistributedGroupSampler(ds, 2, num_replicas=3, rank=r)
            idx = list(iter(s))
            for b in range(len(idx) // 2):
                batch = idx[b * 2 : (b + 1) * 2]
                assert len({ds.flag[i] for i in batch}) == 1

    def test_test_mode_strided(self):
        ds = FakeGroupedDataset([0] * 5)
        ds.test_mode = True
        shards = [
            list(iter(DistributedGroupSampler(ds, 1, num_replicas=2, rank=r)))
            for r in range(2)
        ]
        assert sorted(shards[0] + shards[1]) == [0, 0, 1, 2, 3, 4]


class TestCollate:
    def test_pick_canvas(self):
        assert pick_canvas([(60, 100), (50, 90)], size_divisor=32) == (64, 128)
        assert pick_canvas([(60, 100)], canvas=(128, 128)) == (128, 128)
        assert pick_canvas([(60, 100)], canvas_buckets=[(64, 128), (128, 64)]) == (64, 128)
        with pytest.raises(AssertionError):
            pick_canvas([(100, 100)], canvas=(64, 64))

    def test_collate_shapes(self, coco_ds):
        samples = [coco_ds[0], coco_ds[1]]
        batch = collate(samples, max_gts=5)
        b, h, w, c = batch["image"].shape
        assert b == 2 and c == 3 and h % 32 == 0 and w % 32 == 0
        assert batch["gt_boxes"].shape == (2, 5, 4)
        assert batch["gt_labels"].shape == (2, 5)
        assert batch["gt_valid"].shape == (2, 5)
        assert batch["gt_valid"][0].sum() == 1
        assert batch["img_shape"].shape == (2, 2)
        assert len(batch["img_meta"]) == 2

    def test_collate_fixed_canvas(self, coco_ds):
        batch = collate([coco_ds[0]], max_gts=3, canvas=(128, 160))
        assert batch["image"].shape == (1, 128, 160, 3)

    def test_gt_truncation(self, coco_ds):
        batch = collate([coco_ds[0]], max_gts=1)
        assert batch["gt_boxes"].shape == (1, 1, 4)
        assert batch["gt_valid"].sum() == 1


class TestLoader:
    def test_iterates_and_batches(self, coco_ds):
        # 2 images in 2 aspect groups, each padded to a multiple of 2 -> 2 batches
        dl = build_dataloader(coco_ds, sample_per_replica=2, dist=False, prefetch=2)
        batches = list(dl)
        assert len(batches) == len(dl) == 2
        assert all(b["image"].shape[0] == 2 for b in batches)

    def test_distributed_loader(self, coco_ds):
        dl = build_dataloader(
            coco_ds, sample_per_replica=1, dist=True, num_replicas=2, rank=0
        )
        batches = list(dl)
        assert all(b["image"].shape[0] == 1 for b in batches)

    def test_epoch_reshuffle_and_determinism(self, coco_ds):
        dl = build_dataloader(coco_ds, sample_per_replica=2, dist=False, prefetch=0)
        dl.set_epoch(0)
        a = [b["img_meta"][0]["filename"] for b in dl]
        dl.set_epoch(0)
        b_ = [b["img_meta"][0]["filename"] for b in dl]
        assert a == b_

    def test_worker_pool_matches_serial(self, coco_ds):
        """workers>0 (thread-pool decode) must produce byte-identical batches
        in the same order as the serial path — the in-order sliding window
        preserves determinism."""
        dl0 = build_dataloader(coco_ds, sample_per_replica=2, prefetch=0, workers=0)
        dl2 = build_dataloader(coco_ds, sample_per_replica=2, prefetch=0, workers=2)
        dl0.set_epoch(1)
        dl2.set_epoch(1)
        for b0, b2 in zip(list(dl0), list(dl2), strict=True):
            assert b0.keys() == b2.keys()
            np.testing.assert_array_equal(b0["image"], b2["image"])
            np.testing.assert_array_equal(b0["gt_boxes"], b2["gt_boxes"])
            assert [m["filename"] for m in b0["img_meta"]] == [
                m["filename"] for m in b2["img_meta"]
            ]

    def test_cv2_releases_gil(self):
        """Basis for thread-pool (not process-pool) decode workers: cv2's
        heavy ops must release the GIL so pool threads overlap with python.
        A pure-python counter thread must make substantial progress while
        the main thread runs a large cv2 resize+blur loop."""
        import threading
        import time

        import cv2

        stop = threading.Event()
        counter = [0]

        def spin():
            while not stop.is_set():
                counter[0] += 1

        img = np.random.default_rng(0).integers(0, 255, (2000, 2000, 3), np.uint8)
        t = threading.Thread(target=spin, daemon=True)
        t.start()
        time.sleep(0.05)
        base = counter[0]
        t0 = time.perf_counter()
        for _ in range(3):
            big = cv2.resize(img, (4000, 4000))
            cv2.GaussianBlur(big, (11, 11), 3.0)
        cv2_dt = time.perf_counter() - t0
        during = counter[0] - base
        stop.set()
        t.join()
        # free-running spin rate, measured with the GIL uncontended
        counter[0] = 0
        t0 = time.perf_counter()
        c = 0
        while time.perf_counter() - t0 < 0.1:
            c += 1
        free_rate = c / 0.1
        # while cv2 held the CPU the spinner still advanced at a meaningful
        # fraction of its free rate => cv2 released the GIL (1-core box:
        # progress comes only from GIL handoffs during the cv2 calls)
        assert during > 0.02 * free_rate * cv2_dt, (during, free_rate, cv2_dt)

    def test_prefetch_error_propagates(self, coco_ds):
        def bad_collate(samples):
            raise RuntimeError("boom")

        dl = build_dataloader(coco_ds, sample_per_replica=2, collate_fn=bad_collate)
        with pytest.raises(RuntimeError, match="boom"):
            list(dl)


class TestDevicePrefetch:
    def test_prefetch_to_device(self, coco_ds):
        import jax

        from torch_detection_tpu.data import build_dataloader, prefetch_to_device
        from torch_detection_tpu.parallel import make_mesh

        dl = build_dataloader(coco_ds, sample_per_replica=2, canvas=(128, 128))
        mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
        batches = list(prefetch_to_device(dl, size=2, mesh=mesh))
        assert len(batches) == 2
        b = batches[0]
        assert isinstance(b["image"], jax.Array)
        assert "img_meta" in b and isinstance(b["img_meta"], list)
        assert b["image"].sharding.num_devices == 2

    def test_prefetch_short_iterator(self, coco_ds):
        from torch_detection_tpu.data import build_dataloader, prefetch_to_device

        dl = build_dataloader(coco_ds, sample_per_replica=2, canvas=(128, 128))
        batches = list(prefetch_to_device(dl, size=10))
        assert len(batches) == 2


class TestMaskAndTestCollate:
    def test_collate_with_masks(self, tmp_path_factory):
        from torch_detection_tpu.data import CocoDataset, collate

        root = str(tmp_path_factory.mktemp("coco_mask"))
        ann_file, img_dir = make_coco(root)
        ds = CocoDataset(
            ann_file=ann_file, img_prefix=img_dir,
            img_means=(0, 0, 0), img_stds=(1, 1, 1),
            img_expected_sizes=(100, 60), size_divisor=32, with_mask=True,
        )
        batch = collate([ds[0], ds[1]], max_gts=4)
        assert "gt_masks" in batch
        b, g, h, w = batch["gt_masks"].shape
        assert (b, g) == (2, 4)
        assert (h, w) == batch["image"].shape[1:3]
        # the first image's single valid mask is nonempty
        assert batch["gt_masks"][0, 0].sum() > 0
        assert batch["gt_masks"][0, 1].sum() == 0  # padding row

        # the mask channel dim buckets to the smallest of {8,16,32,64,max}
        # covering the batch (boxes/labels keep the full max_gts slate)
        batch = collate([ds[0], ds[1]], max_gts=100)
        assert batch["gt_masks"].shape[1] == 8
        assert batch["gt_boxes"].shape[1] == 100

    def test_collate_with_crowd(self, tmp_path_factory):
        from torch_detection_tpu.data import CocoDataset, collate

        root = str(tmp_path_factory.mktemp("coco_crowd"))
        ann_file, img_dir = make_coco(root)
        ds = CocoDataset(
            ann_file=ann_file, img_prefix=img_dir,
            img_means=(0, 0, 0), img_stds=(1, 1, 1),
            img_expected_sizes=(100, 60), size_divisor=32, with_crowd=True,
        )
        batch = collate([ds[0]], max_gts=4)
        assert "gt_boxes_ignore" in batch
        assert batch["gt_ignore_valid"][0].sum() == 1  # the crowd ann

    def test_collate_test_tta(self, tmp_path_factory):
        from torch_detection_tpu.data import CocoDataset, collate_test

        root = str(tmp_path_factory.mktemp("coco_tta"))
        ann_file, img_dir = make_coco(root)
        ds = CocoDataset(
            ann_file=ann_file, img_prefix=img_dir,
            img_means=(0, 0, 0), img_stds=(1, 1, 1),
            img_expected_sizes=[(100, 60), (64, 48)], flip_ratio=1.0,
            size_divisor=32, test_mode=True,
        )
        batch = collate_test([ds[0], ds[1]])
        assert len(batch["imgs"]) == 4  # 2 scales x (plain, flip)
        assert all(im.shape[0] == 2 for im in batch["imgs"])
        assert len(batch["img_metas"][0]) == 2
        assert batch["img_metas"][1][0]["flipped_flag"] is True
