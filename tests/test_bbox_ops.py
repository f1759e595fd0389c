import numpy as np
import pytest

pytestmark = pytest.mark.core

from torch_detection_tpu.data.ops import (
    bbox_convert_mode,
    bbox_crop,
    bbox_denormalize,
    bbox_flip,
    bbox_normalize,
    bbox_pad,
    bbox_parse,
    bbox_resize,
    bbox_valid,
)


class TestParse:
    def test_normal_box(self):
        boxes, labels, ignore = [], [], []
        ann = {"bbox": [10, 20, 5, 8], "area": 40, "iscrowd": 0, "category_id": 3}
        ok = bbox_parse(ann, boxes, labels, ignore, {3: 1})
        assert ok and boxes == [[10, 20, 14, 27]] and labels == [1] and ignore == []

    def test_crowd_goes_to_ignore(self):
        boxes, labels, ignore = [], [], []
        ann = {"bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 1, "category_id": 3}
        assert bbox_parse(ann, boxes, labels, ignore, {3: 1})
        assert boxes == [] and ignore == [[0, 0, 9, 9]]

    def test_degenerate_rejected(self):
        boxes, labels, ignore = [], [], []
        assert not bbox_parse({"bbox": [0, 0, 0.5, 10], "area": 5, "iscrowd": 0, "category_id": 1}, boxes, labels, ignore, {1: 1})
        assert not bbox_parse({"bbox": [0, 0, 10, 10], "area": 0, "iscrowd": 0, "category_id": 1}, boxes, labels, ignore, {1: 1})
        assert not bbox_parse({"ignore": True, "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 0, "category_id": 1}, boxes, labels, ignore, {1: 1})
        assert boxes == [] and ignore == []


class TestNormalize:
    def test_roundtrip(self):
        b = np.array([[1.0, 2.0, 3.0, 4.0]])
        means = (0.5, 0.5, 0.5, 0.5)
        stds = (2.0, 2.0, 2.0, 2.0)
        n = bbox_normalize(b, means, stds)
        np.testing.assert_allclose(n, [[0.25, 0.75, 1.25, 1.75]])
        np.testing.assert_allclose(bbox_denormalize(n, means, stds), b)

    def test_class_specific_denorm(self):
        b = np.ones((2, 8))
        out = bbox_denormalize(b, (1, 1, 1, 1), (2, 2, 2, 2))
        np.testing.assert_allclose(out, np.full((2, 8), 3.0))


class TestGeometry:
    def test_resize(self):
        b = np.array([[1.0, 2.0, 3.0, 4.0]])
        np.testing.assert_allclose(bbox_resize(b, 2.0), [[2, 4, 6, 8]])

    def test_hflip(self):
        b = np.array([[10.0, 5.0, 20.0, 15.0]])
        out = bbox_flip(b, (100, 50), True, "horizontal")
        # x1' = w - x2 - 1 = 50-20-1 = 29; x2' = 50-10-1 = 39
        np.testing.assert_allclose(out, [[29, 5, 39, 15]])
        # involution (up to clipping)
        np.testing.assert_allclose(bbox_flip(out, (100, 50)), b)

    def test_vflip(self):
        b = np.array([[10.0, 5.0, 20.0, 15.0]])
        out = bbox_flip(b, (30, 100), True, "vertical")
        np.testing.assert_allclose(out, [[10, 14, 20, 24]])

    def test_noflip(self):
        b = np.array([[1.0, 2.0, 3.0, 4.0]])
        assert bbox_flip(b, (10, 10), flipped_flag=False) is b

    def test_pad(self):
        b = np.ones((3, 4), np.float32)
        out = bbox_pad(b, 5)
        assert out.shape == (5, 4)
        assert (out[3:] == 0).all() and (out[:3] == 1).all()

    def test_pad_truncates(self):
        out = bbox_pad(np.ones((7, 4)), 5)
        assert out.shape == (5, 4)

    def test_valid(self):
        b = np.array([[0, 0, 5, 5], [3, 3, 3, 8], [1, 4, 2, 4]], np.float32)
        l = np.array([1, 2, 3])
        vb, vl = bbox_valid(b, l)
        assert vb.shape == (1, 4) and vl.tolist() == [1]

    def test_convert_mode(self):
        xywh = np.array([[10.0, 20.0, 5.0, 8.0]])
        xyxy = bbox_convert_mode(xywh, "xywh2xyxy")
        np.testing.assert_allclose(xyxy, [[10, 20, 14, 27]])
        np.testing.assert_allclose(bbox_convert_mode(xyxy, "xyxy2xywh"), xywh)

    def test_crop_fits(self, rng):
        img = np.zeros((50, 60, 3), np.uint8)
        b = np.array([[10.0, 10.0, 20.0, 20.0]])
        cropped, mw, mh = bbox_crop(b, img, (30, 30), rng=rng)
        assert 0 <= mw <= 10 and 0 <= mh <= 10
        assert (cropped >= 0).all()
        np.testing.assert_allclose(cropped[0, 2] - cropped[0, 0], 10)
