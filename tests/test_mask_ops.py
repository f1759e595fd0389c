import numpy as np
import pytest

from torch_detection_tpu.data.ops import (
    mask_crop,
    mask_flip,
    mask_pad,
    mask_parse,
    mask_resize,
    poly_to_mask,
    rle_decode,
    rle_encode,
    segm_to_mask,
)


class TestRLE:
    def test_uncompressed_roundtrip(self, rng):
        mask = (rng.random((13, 17)) > 0.5).astype(np.uint8)
        rle = rle_encode(mask, compress=False)
        assert rle["size"] == [13, 17]
        np.testing.assert_array_equal(rle_decode(rle), mask)

    def test_compressed_roundtrip(self, rng):
        mask = (rng.random((23, 9)) > 0.3).astype(np.uint8)
        rle = rle_encode(mask, compress=True)
        assert isinstance(rle["counts"], bytes)
        np.testing.assert_array_equal(rle_decode(rle), mask)

    def test_empty_and_full(self):
        for mask in [np.zeros((5, 5), np.uint8), np.ones((5, 5), np.uint8)]:
            np.testing.assert_array_equal(rle_decode(rle_encode(mask)), mask)

    def test_column_major(self):
        # single pixel at (row=1, col=0) in a 3x2 mask:
        # column-major flat index = 1 -> counts [1, 1, 4]
        mask = np.zeros((3, 2), np.uint8)
        mask[1, 0] = 1
        rle = rle_encode(mask, compress=False)
        assert rle["counts"] == [1, 1, 4]


class TestPoly:
    def test_rect_poly(self):
        # axis-aligned square polygon
        poly = [[2, 2, 8, 2, 8, 8, 2, 8]]
        mask = poly_to_mask(poly, 12, 12)
        assert mask[5, 5] == 1 and mask[0, 0] == 0
        assert mask[2, 2] == 1  # boundary included by fillPoly

    def test_short_poly_skipped(self):
        mask = poly_to_mask([[1, 1, 2, 2]], 5, 5)  # < 3 points
        assert mask.sum() == 0

    def test_segm_to_mask_dispatch(self, rng):
        m = (rng.random((6, 6)) > 0.5).astype(np.uint8)
        np.testing.assert_array_equal(segm_to_mask(rle_encode(m), 6, 6), m)
        assert segm_to_mask([[0, 0, 4, 0, 4, 4, 0, 4]], 6, 6).sum() > 0
        with pytest.raises(TypeError):
            segm_to_mask("bad", 6, 6)

    def test_mask_parse(self):
        gt_masks, polys, lens = [], [], []
        ann = {"segmentation": [[2, 2, 8, 2, 8, 8, 2, 8], [0, 0, 1, 1]]}
        mask_parse(ann, gt_masks, polys, lens, 10, 10)
        assert len(gt_masks) == 1 and gt_masks[0].shape == (10, 10)
        assert len(polys[0]) == 1 and lens == [8]


class TestGeometry:
    def test_resize(self):
        m = np.zeros((10, 10), np.uint8)
        m[:5] = 1
        out = mask_resize(m, scale_factor=2.0)
        assert out.shape == (20, 20) and out[:10].all() and not out[10:].any()

    def test_flip(self):
        m = np.zeros((4, 4), np.uint8)
        m[0, 0] = 1
        assert mask_flip(m, True, "horizontal")[0, 3] == 1
        assert mask_flip(m, True, "vertical")[3, 0] == 1
        assert mask_flip(m, False)[0, 0] == 1

    def test_crop_pad(self):
        m = np.arange(30, dtype=np.uint8).reshape(5, 6) % 2
        c = mask_crop(m, (3, 2), min_w=1, min_h=1)
        assert c.shape == (2, 3)
        p = mask_pad(m, (8, 8))
        assert p.shape == (8, 8) and (p[5:] == 0).all()
