import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.ops import (
    AnchorGenerator,
    MaxIoUAssigner,
    PseudoSampler,
    RandomSampler,
    base_anchors,
    bbox2delta,
    bbox_overlaps,
    delta2bbox,
    grid_anchors,
    multiclass_nms,
    gather_rows,
    take_per_row,
    nms,
    sigmoid_focal_loss,
    smooth_l1_loss,
    iou_loss,
)


@pytest.mark.core
class TestAnchors:
    def test_base_anchor_geometry(self):
        ba = np.asarray(base_anchors(8, ratios=[1.0], scales=[1.0]))
        # ratio 1, scale 1, base 8 -> an 8x8 box centered at 0
        np.testing.assert_allclose(ba, [[-4, -4, 4, 4]])

    def test_base_anchor_ratios_preserve_area(self):
        ba = np.asarray(base_anchors(8, ratios=[0.5, 1.0, 2.0], scales=[1.0]))
        w = ba[:, 2] - ba[:, 0]
        h = ba[:, 3] - ba[:, 1]
        np.testing.assert_allclose(w * h, 64.0, rtol=1e-5)
        np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)

    def test_grid_anchor_shifts(self):
        ba = base_anchors(4, [1.0], [1.0])
        ga = np.asarray(grid_anchors(ba, (2, 3), stride=4))
        assert ga.shape == (6, 4)
        # second anchor is the first shifted right by stride
        np.testing.assert_allclose(ga[1] - ga[0], [4, 0, 4, 0])
        # row stride: anchor (1,0) is index 3
        np.testing.assert_allclose(ga[3] - ga[0], [0, 4, 0, 4])

    def test_generator_octave_scales(self):
        g = AnchorGenerator(strides=(8, 16), ratios=(1.0,), octave_base_scale=4, scales_per_octave=3)
        assert g.num_base_anchors == 3
        np.testing.assert_allclose(g.resolved_scales, [4.0, 4 * 2 ** (1 / 3), 4 * 2 ** (2 / 3)])
        anchors = g.grid_anchors([(4, 4), (2, 2)])
        assert anchors[0].shape == (48, 4) and anchors[1].shape == (12, 4)
        assert g.flat_anchors([(4, 4), (2, 2)]).shape == (60, 4)

    def test_valid_flags(self):
        g = AnchorGenerator(strides=(8,), ratios=(1.0,), scales=(1.0,), octave_base_scale=None)
        flags = np.asarray(g.valid_flags([(4, 4)], img_shape=(17, 32)))
        # ceil(17/8)=3 valid rows of 4 cols
        assert flags.reshape(4, 4).sum() == 12
        assert flags.reshape(4, 4)[:3].all() and not flags.reshape(4, 4)[3].any()

    def test_featmap_sizes(self):
        g = AnchorGenerator(strides=(8, 16, 32))
        assert g.featmap_sizes_for((128, 96)) == [(16, 12), (8, 6), (4, 3)]


@pytest.mark.core
class TestBoxes:
    def test_iou_simple(self):
        a = jnp.array([[0.0, 0.0, 9.0, 9.0]])  # 10x10 inclusive
        b = jnp.array([[0.0, 0.0, 9.0, 9.0], [5.0, 5.0, 14.0, 14.0], [20.0, 20.0, 29.0, 29.0]])
        iou = np.asarray(bbox_overlaps(a, b))
        np.testing.assert_allclose(iou[0, 0], 1.0)
        np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, rtol=1e-5)
        np.testing.assert_allclose(iou[0, 2], 0.0)

    def test_iof(self):
        a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
        b = jnp.array([[0.0, 0.0, 4.0, 9.0]])
        iof = np.asarray(bbox_overlaps(a, b, mode="iof"))
        np.testing.assert_allclose(iof[0, 0], 0.5)

    def test_delta_roundtrip(self, rng):
        props = jnp.asarray(rng.uniform(0, 50, (6, 4)).astype(np.float32))
        props = props.at[:, 2:].set(props[:, :2] + 10 + props[:, 2:] % 20)
        gt = props + jnp.asarray(rng.uniform(-3, 3, (6, 4)).astype(np.float32))
        means, stds = (0.1, 0.1, 0.2, 0.2), (1.0, 1.0, 2.0, 2.0)
        d = bbox2delta(props, gt, means, stds)
        back = delta2bbox(props, d, means, stds)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)

    def test_delta2bbox_class_specific_and_clip(self):
        rois = jnp.array([[0.0, 0.0, 9.0, 9.0]])
        deltas = jnp.zeros((1, 8))
        out = delta2bbox(rois, deltas, max_shape=(8, 8))
        assert out.shape == (1, 8)
        assert np.asarray(out).max() <= 7.0

    def test_zero_delta_identity(self):
        rois = jnp.array([[2.0, 3.0, 11.0, 23.0]])
        out = delta2bbox(rois, jnp.zeros((1, 4)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(rois), atol=1e-4)


@pytest.mark.core
class TestAssigner:
    def _setup(self):
        anchors = jnp.array(
            [
                [0.0, 0.0, 9.0, 9.0],  # iou 1.0 with gt0
                [0.0, 0.0, 4.0, 9.0],  # iou 0.5 with gt0
                [100.0, 100.0, 109.0, 109.0],  # no overlap
                [50.0, 50.0, 59.0, 59.0],  # iou ~0.47 with gt1 (best for gt1)
            ]
        )
        gt = jnp.array([[0.0, 0.0, 9.0, 9.0], [53.0, 50.0, 62.0, 59.0], [0.0, 0.0, 0.0, 0.0]])
        gt_valid = jnp.array([True, True, False])
        gt_labels = jnp.array([3, 7, 0], jnp.int32)
        return anchors, gt, gt_valid, gt_labels

    def test_basic_assignment(self):
        anchors, gt, gt_valid, gt_labels = self._setup()
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.1)
        res = assigner(anchors, gt, gt_valid, gt_labels)
        out = np.asarray(res.assigned_gt_inds)
        assert out[0] == 1  # iou 1.0 -> gt1
        assert out[1] == 1  # iou 0.5 >= pos_thr
        assert out[2] == 0  # negative
        assert out[3] == 2  # best anchor for gt2 via min_pos_iou rule
        labels = np.asarray(res.labels)
        assert labels[0] == 3 and labels[3] == 7 and labels[2] == 0

    def test_padded_gt_never_assigned(self):
        anchors, gt, gt_valid, gt_labels = self._setup()
        res = MaxIoUAssigner()(anchors, gt, gt_valid, gt_labels)
        assert not np.any(np.asarray(res.assigned_gt_inds) == 3)

    def test_no_gt_all_negative(self):
        anchors, gt, _, gt_labels = self._setup()
        res = MaxIoUAssigner()(anchors, gt, jnp.zeros(3, bool), gt_labels)
        assert (np.asarray(res.assigned_gt_inds) == 0).all()

    def test_anchor_valid_mask(self):
        anchors, gt, gt_valid, gt_labels = self._setup()
        res = MaxIoUAssigner()(anchors, gt, gt_valid, gt_labels, anchor_valid=jnp.array([False, True, True, True]))
        assert np.asarray(res.assigned_gt_inds)[0] == -1

    def test_ignore_regions(self):
        anchors, gt, gt_valid, gt_labels = self._setup()
        ignore = jnp.array([[100.0, 100.0, 119.0, 119.0]])
        res = MaxIoUAssigner(ignore_iof_thr=0.5)(
            anchors, gt, gt_valid, gt_labels,
            gt_boxes_ignore=ignore, gt_ignore_valid=jnp.array([True]),
        )
        assert np.asarray(res.assigned_gt_inds)[2] == -1

    def test_samplers(self):
        anchors, gt, gt_valid, gt_labels = self._setup()
        res = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.1)(anchors, gt, gt_valid, gt_labels)
        ps = PseudoSampler()(res)
        assert np.asarray(ps.pos_mask).sum() == 3 and np.asarray(ps.neg_mask).sum() == 1
        rs = RandomSampler(num=2, pos_fraction=0.5)(res, jax.random.PRNGKey(0))
        assert np.asarray(rs.pos_mask).sum() <= 1 + 1  # at most num
        assert not np.any(np.asarray(rs.pos_mask) & np.asarray(rs.neg_mask))


class TestNMS:
    @pytest.mark.core
    def test_single_class_greedy(self):
        boxes = jnp.array(
            [
                [0.0, 0.0, 10.0, 10.0],
                [1.0, 1.0, 11.0, 11.0],  # heavy overlap with 0
                [20.0, 20.0, 30.0, 30.0],
                [21.0, 21.0, 31.0, 31.0],  # heavy overlap with 2
            ]
        )
        scores = jnp.array([0.9, 0.8, 0.7, 0.75])
        res = nms(boxes, scores, iou_thr=0.5, max_out=4)
        v = np.asarray(res.valid)
        assert v.sum() == 2
        np.testing.assert_allclose(np.asarray(res.scores)[:2], [0.9, 0.75])

    def test_nms_score_thr_and_padding(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]])
        scores = jnp.array([0.9, 0.01])
        res = nms(boxes, scores, iou_thr=0.5, score_thr=0.05, max_out=5)
        assert np.asarray(res.valid).sum() == 1
        assert res.boxes.shape == (5, 4)
        assert (np.asarray(res.scores)[1:] == 0).all()

    def test_multiclass_offset_isolation(self):
        # same box, two classes -> both survive class-wise NMS
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]])
        scores = jnp.array([[0.9, 0.0], [0.0, 0.8]])
        res = multiclass_nms(boxes, scores, iou_thr=0.5, score_thr=0.05, max_out=4)
        v = np.asarray(res.valid)
        assert v.sum() == 2
        assert set(np.asarray(res.labels)[v].tolist()) == {0, 1}

    def test_multiclass_suppression_within_class(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 11.0, 11.0]])
        scores = jnp.array([[0.9, 0.0], [0.85, 0.0]])
        res = multiclass_nms(boxes, scores, iou_thr=0.5, score_thr=0.05, max_out=4)
        assert np.asarray(res.valid).sum() == 1

    def test_multiclass_class_specific_boxes(self):
        boxes = jnp.stack([jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]])] * 3, axis=1)
        scores = jnp.array([[0.9, 0.1, 0.2], [0.1, 0.8, 0.1]])
        res = multiclass_nms(boxes, scores, iou_thr=0.5, score_thr=0.3, max_out=4)
        v = np.asarray(res.valid)
        assert v.sum() == 2

    def test_nms_backfills_beyond_max_out(self):
        # candidates ranked below max_out must backfill slots freed by
        # suppression (true NMS-then-topk, not topk-then-NMS)
        boxes = jnp.array(
            [
                [0.0, 0.0, 10.0, 10.0],
                [1.0, 1.0, 11.0, 11.0],  # suppressed by 0
                [50.0, 50.0, 60.0, 60.0],  # rank 2 — beyond max_out=2 pool cut
            ]
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        res = nms(boxes, scores, iou_thr=0.5, max_out=2)
        v = np.asarray(res.valid)
        assert v.sum() == 2
        np.testing.assert_allclose(np.asarray(res.scores)[v], [0.9, 0.7])
        np.testing.assert_array_equal(np.asarray(res.indices)[v], [0, 2])
        # with pre_top_k=2 the old truncating behavior is recoverable
        res_tr = nms(boxes, scores, iou_thr=0.5, max_out=2, pre_top_k=2)
        assert np.asarray(res_tr.valid).sum() == 1

    def test_nms_labels_are_class_ids_not_indices(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]])
        scores = jnp.array([0.5, 0.9])  # second box ranks first
        res = nms(boxes, scores, iou_thr=0.5, max_out=4)
        labels = np.asarray(res.labels)
        np.testing.assert_array_equal(labels, [0, 0, -1, -1])
        np.testing.assert_array_equal(np.asarray(res.indices), [1, 0, -1, -1])

    def test_multiclass_indices_point_at_source_boxes(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0], [30.0, 30.0, 40.0, 40.0]])
        scores = jnp.array([[0.01, 0.9], [0.8, 0.02]])
        res = multiclass_nms(boxes, scores, iou_thr=0.5, score_thr=0.05, max_out=4)
        v = np.asarray(res.valid)
        got = {
            (int(l), int(i))
            for l, i in zip(np.asarray(res.labels)[v], np.asarray(res.indices)[v])
        }
        assert got == {(1, 0), (0, 1)}

    def test_approx_top_k_pool_matches_exact_semantics(self, rng):
        # approx_max_k selects the candidate pool; on random boxes the kept
        # set must still be valid greedy-NMS output over its own pool, and on
        # CPU (where approx reduces little) nearly identical to exact
        n, c = 300, 7
        xy = rng.uniform(0, 200, (n, 2)).astype(np.float32)
        wh = rng.uniform(5, 40, (n, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        scores = jnp.asarray(rng.uniform(0, 1, (n, c)).astype(np.float32))
        exact = multiclass_nms(boxes, scores, iou_thr=0.5, score_thr=0.05,
                               pre_nms_top_k=64, max_out=32)
        approx = multiclass_nms(boxes, scores, iou_thr=0.5, score_thr=0.05,
                                pre_nms_top_k=64, max_out=32, approx_top_k=True)
        assert approx.boxes.shape == exact.boxes.shape
        ve, va = np.asarray(exact.valid), np.asarray(approx.valid)
        assert va.sum() > 0
        # overlap of the kept (label, index) sets should be high
        se = {(int(l), int(i)) for l, i in
              zip(np.asarray(exact.labels)[ve], np.asarray(exact.indices)[ve])}
        sa = {(int(l), int(i)) for l, i in
              zip(np.asarray(approx.labels)[va], np.asarray(approx.indices)[va])}
        assert len(se & sa) / max(len(se), 1) > 0.8

    def test_single_class_approx_pool(self, rng):
        n = 200
        xy = rng.uniform(0, 300, (n, 2)).astype(np.float32)
        wh = rng.uniform(5, 20, (n, 2)).astype(np.float32)
        boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
        scores = jnp.asarray(rng.uniform(0.1, 1.0, n).astype(np.float32))
        res = nms(boxes, scores, iou_thr=0.6, max_out=50, pre_top_k=64,
                  approx_top_k=True)
        v = np.asarray(res.valid)
        assert v.sum() > 0
        # scores sorted descending among kept
        s = np.asarray(res.scores)[v]
        assert (np.diff(s) <= 1e-6).all()

    @pytest.mark.core
    def test_against_reference_greedy(self, rng):
        # compare against a hand-rolled numpy greedy NMS on random boxes
        n = 60
        xy = rng.uniform(0, 80, (n, 2)).astype(np.float32)
        wh = rng.uniform(5, 30, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], -1)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)

        def np_greedy(boxes, scores, thr):
            order = np.argsort(-scores)
            keep = []
            suppressed = np.zeros(n, bool)
            for i in order:
                if suppressed[i]:
                    continue
                keep.append(i)
                x1 = np.maximum(boxes[i, 0], boxes[:, 0])
                y1 = np.maximum(boxes[i, 1], boxes[:, 1])
                x2 = np.minimum(boxes[i, 2], boxes[:, 2])
                y2 = np.minimum(boxes[i, 3], boxes[:, 3])
                w = np.clip(x2 - x1 + 1, 0, None)
                h = np.clip(y2 - y1 + 1, 0, None)
                inter = w * h
                a = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
                ai = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
                iou = inter / (a + ai - inter)
                suppressed |= iou > thr
                suppressed[i] = False  # self
            return sorted(keep, key=lambda j: -scores[j])

        want = np_greedy(boxes, scores, 0.5)
        res = nms(jnp.asarray(boxes), jnp.asarray(scores), iou_thr=0.5, max_out=n)
        got_scores = np.asarray(res.scores)[np.asarray(res.valid)]
        np.testing.assert_allclose(got_scores, scores[want], rtol=1e-6)


@pytest.mark.core
class TestLosses:
    def test_sparse_focal_matches_dense_values_and_grads(self, rng):
        from torch_detection_tpu.ops.losses import sigmoid_focal_loss_sparse

        n, c = 200, 11
        logits = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        label0 = jnp.asarray(rng.integers(-1, c, n), jnp.int32)  # -1 = bg
        onehot = jax.nn.one_hot(jnp.clip(label0, 0, c - 1), c) * (label0 >= 0)[:, None]
        w = jnp.asarray((rng.uniform(size=n) > 0.2).astype(np.float32))[:, None]
        af = jnp.float32(17.0)

        def dense(x):
            return sigmoid_focal_loss(x, onehot, weight=w, gamma=2.0, alpha=0.25, avg_factor=af)

        def sparse(x):
            return sigmoid_focal_loss_sparse(x, label0, weight=w, gamma=2.0, alpha=0.25, avg_factor=af)

        np.testing.assert_allclose(float(dense(logits)), float(sparse(logits)), rtol=1e-6)
        gd = jax.grad(dense)(logits)
        gs = jax.grad(sparse)(logits)  # analytic custom_vjp
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gs), rtol=2e-5, atol=1e-7)
        # bf16 logits path: grads returned in bf16, close to the f32 ones
        gsb = jax.grad(lambda x: sparse(x.astype(jnp.bfloat16)))(logits)
        np.testing.assert_allclose(np.asarray(gsb), np.asarray(gd), rtol=0.05, atol=3e-3)

    def test_focal_loss_matches_manual(self):
        logits = jnp.array([[2.0, -1.0]])
        targets = jnp.array([[1.0, 0.0]])
        loss = sigmoid_focal_loss(logits, targets, gamma=2.0, alpha=0.25, avg_factor=1.0)
        p = 1 / (1 + np.exp(-2.0))
        want_pos = 0.25 * (1 - p) ** 2 * -np.log(p)
        q = 1 / (1 + np.exp(1.0))
        want_neg = 0.75 * q**2 * -np.log(1 - q)
        np.testing.assert_allclose(float(loss), want_pos + want_neg, rtol=1e-5)

    def test_smooth_l1(self):
        pred = jnp.array([0.0, 2.0])
        target = jnp.array([0.05, 0.0])
        beta = 1.0
        loss = smooth_l1_loss(pred, target, beta=beta)
        want = 0.5 * 0.05**2 / beta + (2.0 - 0.5 * beta)
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_weights_and_avg_factor(self):
        pred = jnp.ones((4,))
        target = jnp.zeros((4,))
        w = jnp.array([1.0, 1.0, 0.0, 0.0])
        loss = smooth_l1_loss(pred, target, weight=w, beta=1.0, avg_factor=2.0)
        np.testing.assert_allclose(float(loss), 0.5, rtol=1e-5)

    def test_iou_loss_perfect_match(self):
        b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        assert float(iou_loss(b, b, mode="giou")) < 1e-5
        assert float(iou_loss(b, b, mode="linear_iou")) < 1e-5

    def test_giou_disjoint(self):
        a = jnp.array([[0.0, 0.0, 9.0, 9.0]])
        b = jnp.array([[20.0, 0.0, 29.0, 9.0]])
        # IoU=0, enclosure 30x10=300, union 200 -> giou = 0 - 100/300
        loss = float(iou_loss(a, b, mode="giou"))
        np.testing.assert_allclose(loss, 1 + 100.0 / 300.0, rtol=1e-5)


@pytest.mark.core
class TestTpuGather:
    """ops/tpu_gather one-hot selections must be EXACT vs plain indexing."""

    def test_gather_rows_float_exact(self):
        rng = np.random.default_rng(0)
        table = jnp.asarray(rng.uniform(0, 1333, (100, 4)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 100, (5000,), dtype=np.int32))
        got = gather_rows(table, idx)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(table)[np.asarray(idx)])

    def test_gather_rows_int_and_1d(self):
        rng = np.random.default_rng(1)
        labels = jnp.asarray(rng.integers(0, 81, (37,), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, 37, (999,), dtype=np.int32))
        got = gather_rows(labels, idx)
        assert got.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(got), np.asarray(labels)[np.asarray(idx)])

    def test_gather_rows_out_of_range_is_zero(self):
        table = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
        got = gather_rows(table, jnp.array([0, 7, -1], jnp.int32))
        np.testing.assert_array_equal(np.asarray(got[1]), np.zeros(3))
        np.testing.assert_array_equal(np.asarray(got[2]), np.zeros(3))

    def test_take_per_row_2d_bool_with_inf_sentinels(self):
        vals = jnp.array([[True, False], [False, True]])
        idx = jnp.array([1, 1], jnp.int32)
        got = take_per_row(vals, idx)
        assert got.dtype == jnp.bool_
        np.testing.assert_array_equal(np.asarray(got), np.array([False, True]))
        # inf in non-selected lanes must not poison the selected one
        v = jnp.array([[np.inf, 3.0], [5.0, np.inf]], jnp.float32)
        got = take_per_row(v, jnp.array([1, 0], jnp.int32))
        np.testing.assert_array_equal(np.asarray(got), np.array([3.0, 5.0], np.float32))

    def test_take_per_row_3d_exact(self):
        rng = np.random.default_rng(2)
        vals = jnp.asarray(rng.normal(size=(211, 20, 4)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 20, (211,), dtype=np.int32))
        got = take_per_row(vals, idx)
        want = np.take_along_axis(np.asarray(vals), np.asarray(idx)[:, None, None], axis=1)[:, 0]
        np.testing.assert_array_equal(np.asarray(got), want)


def _iou_np_pair(a, b, offset=1.0):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    iw, ih = max(x2 - x1 + offset, 0.0), max(y2 - y1 + offset, 0.0)
    inter = iw * ih
    aa = (a[2] - a[0] + offset) * (a[3] - a[1] + offset)
    ab = (b[2] - b[0] + offset) * (b[3] - b[1] + offset)
    return inter / (aa + ab - inter)


def _soft_nms_oracle(boxes, scores, method, sigma, iou_thr, max_out):
    """Direct transcription of Bodla et al. Alg. 1: pick max, decay rest."""
    s = scores.astype(np.float64).copy()
    pool = list(range(len(s)))
    picked = []
    while pool and len(picked) < max_out:
        j = max(pool, key=lambda t: s[t])
        picked.append((j, s[j]))
        pool.remove(j)
        for t in pool:
            iou = _iou_np_pair(boxes[j], boxes[t])
            if method == "gaussian":
                s[t] *= np.exp(-iou * iou / sigma)
            elif iou > iou_thr:
                s[t] *= 1.0 - iou
    return picked


class TestSoftNMS:
    def _random_pool(self, seed, n=40):
        rng = np.random.default_rng(seed)
        x1 = rng.uniform(0, 80, n)
        y1 = rng.uniform(0, 80, n)
        boxes = np.stack(
            [x1, y1, x1 + rng.uniform(5, 40, n), y1 + rng.uniform(5, 40, n)], -1
        ).astype(np.float32)
        scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
        return boxes, scores

    @pytest.mark.parametrize("method", ["gaussian", "linear"])
    def test_matches_paper_oracle(self, method):
        from torch_detection_tpu.ops import soft_nms

        for seed in (0, 1, 2):
            boxes, scores = self._random_pool(seed)
            res = soft_nms(
                jnp.asarray(boxes), jnp.asarray(scores), method=method,
                sigma=0.5, iou_thr=0.3, score_thr=1e-3, max_out=20,
            )
            want = _soft_nms_oracle(boxes, scores, method, 0.5, 0.3, 20)
            v = np.asarray(res.valid)
            got_idx = np.asarray(res.indices)[v]
            got_s = np.asarray(res.scores)[v]
            want_idx = np.asarray([j for j, s in want if s > 1e-3])
            want_s = np.asarray([s for _, s in want if s > 1e-3])
            np.testing.assert_array_equal(got_idx, want_idx)
            np.testing.assert_allclose(got_s, want_s, rtol=1e-5)

    def test_decayed_not_deleted(self):
        """Two heavily-overlapping boxes: hard NMS keeps one, soft keeps
        both (the second at a decayed score)."""
        from torch_detection_tpu.ops import soft_nms

        boxes = jnp.asarray(
            [[0.0, 0.0, 20.0, 20.0], [1.0, 1.0, 21.0, 21.0]], jnp.float32
        )
        scores = jnp.asarray([0.9, 0.8])
        hard = nms(boxes, scores, iou_thr=0.5, max_out=4)
        assert int(np.asarray(hard.valid).sum()) == 1
        soft = soft_nms(boxes, scores, method="gaussian", sigma=0.5, max_out=4)
        v = np.asarray(soft.valid)
        assert int(v.sum()) == 2
        s = np.asarray(soft.scores)
        assert s[0] == pytest.approx(0.9)
        assert 0.0 < s[1] < 0.8  # decayed, not deleted

    def test_multiclass_cross_class_no_decay(self):
        from torch_detection_tpu.ops import multiclass_soft_nms

        # identical boxes in different classes must both survive untouched
        boxes = jnp.asarray([[0.0, 0.0, 20.0, 20.0]] * 2, jnp.float32)
        scores = jnp.asarray([[0.9, 0.0], [0.0, 0.8]])
        res = multiclass_soft_nms(
            boxes, scores, method="gaussian", sigma=0.5, score_thr=0.01,
            pre_nms_top_k=4, max_out=4,
        )
        v = np.asarray(res.valid)
        assert int(v.sum()) == 2
        np.testing.assert_allclose(sorted(np.asarray(res.scores)[v]), [0.8, 0.9])

    def test_decode_detections_soft_path_jits(self):
        import dataclasses

        from torch_detection_tpu.models.detectors import (
            RetinaNetConfig, SingleStageDetector, decode_detections,
        )

        model = SingleStageDetector(
            backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
            neck=dict(type="FPN", in_channels=(128, 256, 512), out_channels=16,
                      num_outs=5, add_extra_convs=True),
            head=dict(type="RetinaHead", num_classes=2, in_channels=16,
                      feat_channels=16, stacked_convs=1, num_base_anchors=9),
        )
        cfg = RetinaNetConfig(
            num_classes=2, nms_method="soft", soft_sigma=0.5,
            max_detections=10, pre_nms_top_k=64, score_thr=0.0,
        )
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        @jax.jit
        def infer(v, x):
            cls, reg = model.apply(v, x)
            return decode_detections(cfg, cls, reg)

        dets = infer(vars_, x)
        assert dets.boxes.shape == (1, 10, 4)
        assert np.asarray(dets.valid).sum() >= 0  # runs and is finite
        assert np.isfinite(np.asarray(dets.scores)).all()
