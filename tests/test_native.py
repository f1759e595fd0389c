"""C++ native tier: build, parity with the python oracle, and speed sanity."""

import numpy as np
import pytest

pytestmark = pytest.mark.core

from torch_detection_tpu import native


def _random_boxes(rng, n, span=100):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(2, 40, (n, 2))
    return np.concatenate([xy, xy + wh], -1)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def _py_match(det, gt, gt_ignore, regions, thr):
    """Reimplementation of the python-oracle matcher for parity testing."""
    from torch_detection_tpu.engine.eval import _iou_matrix

    d, g = len(det), len(gt)
    matched = np.zeros(d, bool)
    det_ignored = np.zeros(d, bool)
    gt_taken = np.zeros(g, bool)
    iou = _iou_matrix(det, gt)
    iou_r = _iou_matrix(det, regions) if len(regions) else None
    for i in range(d):
        best_j, best_iou = -1, thr
        best_ig_j, best_ig_iou = -1, thr
        for j in range(g):
            if gt_taken[j] or iou[i, j] < thr:
                continue
            if gt_ignore[j]:
                if iou[i, j] > best_ig_iou:
                    best_ig_iou, best_ig_j = iou[i, j], j
            elif iou[i, j] > best_iou or best_j < 0:
                best_iou, best_j = iou[i, j], j
        if best_j >= 0:
            matched[i] = True
            gt_taken[best_j] = True
        elif best_ig_j >= 0:
            det_ignored[i] = True
            gt_taken[best_ig_j] = True
        elif iou_r is not None and iou_r[i].size and iou_r[i].max() >= thr:
            det_ignored[i] = True
    return matched, det_ignored


class TestNative:
    def test_iou_matrix_parity(self, lib, rng):
        from torch_detection_tpu.engine.eval import _iou_matrix

        a = _random_boxes(rng, 37)
        b = _random_boxes(rng, 23)
        got = native.iou_matrix(a, b)
        np.testing.assert_allclose(got, _iou_matrix(a, b), rtol=1e-12)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_match_parity_randomized(self, lib, seed):
        rng = np.random.default_rng(seed)
        det = _random_boxes(rng, 50)
        gt = _random_boxes(rng, 20)
        gt_ignore = rng.random(20) < 0.3
        regions = _random_boxes(rng, 5)
        for thr in (0.3, 0.5, 0.75):
            got_m, got_i = native.match_image(det, gt, gt_ignore, regions, thr)
            want_m, want_i = _py_match(det, gt, gt_ignore, regions, thr)
            np.testing.assert_array_equal(got_m, want_m)
            np.testing.assert_array_equal(got_i, want_i)

    def test_empty_inputs(self, lib):
        det = np.zeros((0, 4))
        gt = np.zeros((0, 4))
        m, i = native.match_image(det, gt, np.zeros(0, bool), np.zeros((0, 4)), 0.5)
        assert m.shape == (0,) and i.shape == (0,)

    def test_eval_uses_native(self, lib):
        """eval_coco_map must produce identical results with/without native."""
        from torch_detection_tpu.engine.eval import eval_coco_map

        rng = np.random.default_rng(7)
        dets, anns = [], []
        for _ in range(4):
            boxes = _random_boxes(rng, 12)
            dets.append(dict(
                boxes=boxes + rng.normal(0, 2, boxes.shape),
                scores=rng.random(12).astype(np.float32),
                labels=rng.integers(1, 4, 12),
            ))
            anns.append(dict(
                bboxes=boxes,
                labels=rng.integers(1, 4, 12),
                bboxes_ignore=np.zeros((0, 4)),
            ))
        with_native = eval_coco_map(dets, anns, 3)
        # force fallback
        saved = native._lib, native._tried
        native._lib, native._tried = None, True
        try:
            without = eval_coco_map(dets, anns, 3)
        finally:
            native._lib, native._tried = saved
        for key, val in with_native.items():
            if isinstance(val, float):
                assert val == pytest.approx(without[key], abs=1e-9), key
