import numpy as np
import pytest

pytestmark = pytest.mark.core

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

    def test_vectorized_codec_matches_scalar_oracle(self, rng):
        """The numpy LEB128-style codec must be byte-identical to the scalar
        reference implementation (the published COCO format)."""
        from torch_detection_tpu.data.ops.mask import (
            _rle_compress,
            _rle_compress_py,
            _rle_decompress,
            _rle_decompress_py,
        )

        for _ in range(30):
            h, w = rng.integers(1, 60, 2)
            mask = (rng.random((h, w)) < rng.uniform(0.05, 0.95)).astype(np.uint8)
            counts = rle_encode(mask, compress=False)["counts"]
            assert _rle_compress(counts) == _rle_compress_py(counts)
            s = _rle_compress(counts)
            assert list(_rle_decompress(s)) == list(_rle_decompress_py(s)) == counts
        assert _rle_compress([]) == b""
        assert list(_rle_decompress(b"")) == []

    def test_rle_area_and_interval_iou_match_dense(self, rng):
        """Run-native area/IoU (the streaming-eval path) == dense pixel math,
        including the crowd (intersection / dt-area) rule."""
        from torch_detection_tpu.data.ops.mask import rle_area, rle_iou_matrix
        from torch_detection_tpu.engine.eval import mask_iou_matrix

        h, w = 40, 33
        dense = [(rng.random((h, w)) < rng.uniform(0.1, 0.7)).astype(np.uint8)
                 for _ in range(9)]
        rles = [rle_encode(m) for m in dense]
        for m, r in zip(dense, rles):
            assert rle_area(r) == int(m.sum())
        got = rle_iou_matrix(rles[:5], rles[5:])
        want = mask_iou_matrix(np.asarray(dense[:5]), np.asarray(dense[5:]))
        np.testing.assert_allclose(got, want, atol=1e-12)
        d = np.asarray(dense[:5], bool).reshape(5, -1).astype(np.float64)
        g = np.asarray(dense[5:], bool).reshape(4, -1).astype(np.float64)
        want_crowd = (d @ g.T) / np.maximum(d.sum(1)[:, None], 1e-9)
        np.testing.assert_allclose(
            rle_iou_matrix(rles[:5], rles[5:], crowd=True), want_crowd, atol=1e-12
        )
        assert rle_iou_matrix([], rles).shape == (0, 9)
        assert rle_iou_matrix(rles, []).shape == (9, 0)


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
