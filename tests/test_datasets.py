import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.core

from data_fixtures import make_coco, make_voc
from torch_detection_tpu.data import (
    COCO,
    BackgroundErasing,
    CocoDataset,
    ConcatDataset,
    DataContainer,
    VOCDataset,
    collate,
    get_datasets,
)


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coco"))
    ann_file, img_dir = make_coco(root)
    return root, ann_file, img_dir


def make_dataset(ann_file, img_dir, **kw):
    defaults = dict(
        ann_file=ann_file,
        img_prefix=img_dir,
        img_means=(123.675, 116.28, 103.53),
        img_stds=(58.395, 57.12, 57.375),
        img_expected_sizes=(100, 60),
        size_divisor=32,
        flip_ratio=0.0,
    )
    defaults.update(kw)
    return CocoDataset(**defaults)


class TestCocoAPI:
    def test_index(self, coco_root):
        _, ann_file, _ = coco_root
        coco = COCO(ann_file)
        assert coco.get_cat_ids() == [11, 13]
        assert coco.get_img_ids() == [1, 2, 3]
        assert sorted(coco.get_ann_ids(img_ids=[1])) == [1, 2]
        assert coco.get_ann_ids(cat_ids=[13], img_ids=[2]) == [3]
        assert coco.load_cats([11])[0]["name"] == "cat"

    def test_ann_to_mask(self, coco_root):
        _, ann_file, _ = coco_root
        coco = COCO(ann_file)
        m = coco.ann_to_mask(coco.load_anns([1])[0])
        assert m.shape == (60, 100) and m[20, 20] == 1 and m[50, 80] == 0


class TestCocoDataset:
    def test_load_and_filter(self, coco_root):
        _, ann_file, img_dir = coco_root
        ds = make_dataset(ann_file, img_dir)
        # image 3 (no anns) filtered out in train mode
        assert len(ds) == 2
        assert ds.cat2label == {11: 1, 13: 2}
        assert ds.classes == ["cat", "dog"]
        # aspect flags: a.jpg landscape -> 1, b.jpg portrait -> 0
        assert ds.flag.tolist() == [1, 0]

    def test_ann_info(self, coco_root):
        _, ann_file, img_dir = coco_root
        ds = make_dataset(ann_file, img_dir)
        ann = ds.get_ann_info(0)
        # ann 1 normal, ann 2 crowd -> ignore
        np.testing.assert_allclose(ann["bboxes"], [[10, 10, 39, 29]])
        assert ann["labels"].tolist() == [1]
        np.testing.assert_allclose(ann["bboxes_ignore"], [[50, 20, 69, 39]])

    def test_masks(self, coco_root):
        _, ann_file, img_dir = coco_root
        ds = make_dataset(ann_file, img_dir, with_mask=True)
        ann = ds.get_ann_info(0)
        assert len(ann["masks"]) == 1  # crowd mask skipped
        assert ann["masks"][0].shape == (60, 100)

    def test_train_sample(self, coco_root):
        _, ann_file, img_dir = coco_root
        ds = make_dataset(ann_file, img_dir, flip_ratio=0.5)
        sample = ds[0]
        img = sample["img"].data
        assert img.ndim == 3 and img.shape[-1] == 3  # HWC
        assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0
        meta = sample["img_meta"].data
        assert meta["ori_shape"] == (60, 100, 3)
        assert isinstance(sample["gt_bboxes"], DataContainer)
        # scale factor maps ori box to transformed
        sf = meta["scale_factor"]
        assert sample["gt_bboxes"].data.max() <= max(meta["img_shape"][:2])
        assert sf == min(60 / 60, 100 / 100)

    def test_train_sample_deterministic(self, coco_root):
        _, ann_file, img_dir = coco_root
        ds = make_dataset(ann_file, img_dir, flip_ratio=0.5, seed=3)
        s1 = ds[0]
        s2 = ds[0]
        np.testing.assert_array_equal(s1["img"].data, s2["img"].data)
        ds.set_epoch(1)
        s3 = ds[0]
        assert s3["img_meta"].data != s1["img_meta"].data or True  # may differ

    def test_test_mode_tta(self, coco_root):
        _, ann_file, img_dir = coco_root
        ds = make_dataset(
            ann_file, img_dir, test_mode=True,
            img_expected_sizes=[(100, 60), (64, 48)], flip_ratio=1.0,
        )
        assert len(ds) == 3  # no filtering in test mode
        sample = ds[0]
        assert len(sample["img"]) == 4  # 2 scales x (no-flip, flip)
        metas = [m.data for m in sample["img_meta"]]
        assert metas[0]["flipped_flag"] is False and metas[1]["flipped_flag"] is True


class TestVOC:
    def test_voc07(self, tmp_path):
        base = make_voc(str(tmp_path))
        ds = VOCDataset(
            cache_dir=str(tmp_path / "cache"),
            dataset_scope="voc07",
            dataset_root=base,
            img_expected_sizes=(100, 60),
            size_divisor=32,
        )
        assert len(ds) == 2
        ann = ds.get_ann_info(0)
        # difficult object routed to ignore; coords 0-based
        np.testing.assert_allclose(ann["bboxes"], [[9, 9, 39, 34]])
        assert ann["labels"].tolist() == [12]  # dog
        np.testing.assert_allclose(ann["bboxes_ignore"], [[4, 4, 19, 19]])
        # cache file exists and reloads
        assert osp.isfile(str(tmp_path / "cache" / "voc07_train.pkl"))
        ds2 = VOCDataset(
            cache_dir=str(tmp_path / "cache"),
            dataset_scope="voc07",
            dataset_root=base,
            img_expected_sizes=(100, 60),
        )
        assert len(ds2) == 2

    def test_voc_test_mode(self, tmp_path):
        base = make_voc(str(tmp_path))
        ds = VOCDataset(
            cache_dir=str(tmp_path / "cache"),
            dataset_scope="voc07",
            dataset_root=base,
            img_expected_sizes=(64, 64),
            test_mode=True,
        )
        assert len(ds) == 1
        sample = ds[0]
        assert len(sample["img"]) == 1


class TestConcatAndFactory:
    def test_concat_flags(self, coco_root):
        _, ann_file, img_dir = coco_root
        d1 = make_dataset(ann_file, img_dir)
        d2 = make_dataset(ann_file, img_dir)
        cat = ConcatDataset([d1, d2])
        assert len(cat) == 4
        assert cat.flag.tolist() == [1, 0, 1, 0]
        s = cat[2]  # second dataset, first image
        assert s["img_meta"].data["filename"] == "a.jpg"

    def test_get_datasets_fanout(self, coco_root):
        _, ann_file, img_dir = coco_root
        cfg = dict(
            type="CocoDataset",
            ann_file=[ann_file, ann_file],
            img_prefix=img_dir,
            img_means=(0, 0, 0),
            img_stds=(1, 1, 1),
            img_expected_sizes=(100, 60),
            size_divisor=32,
        )
        ds = get_datasets(cfg)
        assert isinstance(ds, ConcatDataset) and len(ds) == 4

    def test_get_datasets_single(self, coco_root):
        _, ann_file, img_dir = coco_root
        cfg = dict(
            type="CocoDataset", ann_file=ann_file, img_prefix=img_dir,
            img_means=(0, 0, 0), img_stds=(1, 1, 1),
            img_expected_sizes=(100, 60),
        )
        ds = get_datasets(cfg)
        assert isinstance(ds, CocoDataset)


class TestBackgroundErasing:
    def test_erases_only_background(self, rng):
        be = BackgroundErasing()
        img = np.ones((96, 96, 3), np.float32)
        bbox = np.array([[0.0, 0.0, 31.0, 31.0]])
        out = be(img.copy(), (96, 96, 3), bbox, cell_size=32, random_ratio=1.0, rng=rng)
        # gt cell (top-left) is untouched (expanded gt overlaps it); with
        # ratio=1 every pure-background cell is zeroed. Expanded gt reaches
        # 46px, so cells starting at 64 are background.
        assert out[:16, :16].all()  # inside gt
        assert not out[64:, 64:].any()  # far background cell erased

    def test_no_gt_erases_ratio(self, rng):
        be = BackgroundErasing()
        img = np.ones((64, 64, 3), np.float32)
        out = be(img.copy(), (64, 64, 3), np.zeros((0, 4)), cell_size=32, random_ratio=0.5, rng=rng)
        zero_cells = sum(
            not out[y : y + 32, x : x + 32].any()
            for y in (0, 32)
            for x in (0, 32)
        )
        assert zero_cells == 2  # ceil(4 * 0.5)
