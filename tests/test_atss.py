"""ATSS family: adaptive assigner, targets, loss, decode, export.

Covers ``ops/assign.py::ATSSAssigner``, ``models/heads/atss_head.py`` and
``models/detectors/atss.py`` — the seventh detector family; the reference
has no detector tier at all (SURVEY.md §2 #33)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models.detectors import (
    ATSSConfig,
    SingleStageDetector,
    atss_loss,
    decode_atss,
)
from torch_detection_tpu.models.detectors.atss import _level_counts, atss_targets
from torch_detection_tpu.ops.anchors import AnchorGenerator
from torch_detection_tpu.ops.assign import ATSSAssigner


def _iou_np(a, b):
    """Pairwise IoU, inclusive +1 convention (matches ops.boxes)."""
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    iw = np.clip(x2 - x1 + 1, 0, None)
    ih = np.clip(y2 - y1 + 1, 0, None)
    inter = iw * ih
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def _atss_oracle(anchors, level_counts, gt, gt_valid, topk):
    """Direct numpy transcription of the ATSS rule (paper Alg. 1)."""
    n = anchors.shape[0]
    g = gt.shape[0]
    ious = _iou_np(anchors, gt)  # (N, G)
    acx = (anchors[:, 0] + anchors[:, 2]) / 2
    acy = (anchors[:, 1] + anchors[:, 3]) / 2
    gcx = (gt[:, 0] + gt[:, 2]) / 2
    gcy = (gt[:, 1] + gt[:, 3]) / 2
    assigned = np.zeros((n,), np.int32)
    pos_iou = np.full((n,), -np.inf)
    for j in range(g):
        if not gt_valid[j]:
            continue
        cand = []
        start = 0
        for n_l in level_counts:
            d = (acx[start:start + n_l] - gcx[j]) ** 2 + (
                acy[start:start + n_l] - gcy[j]) ** 2
            k = min(topk, n_l)
            cand.extend(start + np.argsort(d, kind="stable")[:k])
            start += n_l
        cand = np.asarray(cand)
        ci = ious[cand, j]
        thr = ci.mean() + ci.std(ddof=1)
        for idx, iou in zip(cand, ci):
            inside = (
                acx[idx] - gt[j, 0] > 0.01 and acy[idx] - gt[j, 1] > 0.01
                and gt[j, 2] - acx[idx] > 0.01 and gt[j, 3] - acy[idx] > 0.01
            )
            if iou >= thr and inside and ious[idx, j] > pos_iou[idx]:
                assigned[idx] = j + 1
                pos_iou[idx] = ious[idx, j]
    return assigned


class TestATSSAssigner:
    def _grid_anchors(self):
        gen = AnchorGenerator(
            strides=(8, 16), ratios=(1.0,), octave_base_scale=8.0,
            scales_per_octave=1,
        )
        sizes = [(8, 8), (4, 4)]
        anchors = np.asarray(gen.flat_anchors(sizes))
        return anchors, (64, 16)

    def test_matches_numpy_oracle(self):
        anchors, level_counts = self._grid_anchors()
        rng = np.random.default_rng(3)
        for trial in range(4):
            g = 5
            x1 = rng.uniform(0, 40, g)
            y1 = rng.uniform(0, 40, g)
            gt = np.stack(
                [x1, y1, x1 + rng.uniform(8, 30, g), y1 + rng.uniform(8, 30, g)],
                axis=-1,
            ).astype(np.float32)
            gt_valid = np.array([True, True, True, True, trial % 2 == 0])
            labels = np.arange(1, g + 1, dtype=np.int32)

            want = _atss_oracle(anchors, level_counts, gt, gt_valid, topk=9)
            got = ATSSAssigner(topk=9)(
                jnp.asarray(anchors), level_counts, jnp.asarray(gt),
                jnp.asarray(gt_valid), jnp.asarray(labels),
            )
            np.testing.assert_array_equal(np.asarray(got.assigned_gt_inds), want)
            # labels follow the assignment
            lab = np.asarray(got.labels)
            assert (lab[want > 0] == want[want > 0]).all()
            assert (lab[want == 0] == 0).all()

    def test_no_valid_gt_all_negative(self):
        anchors, level_counts = self._grid_anchors()
        gt = np.zeros((3, 4), np.float32)
        got = ATSSAssigner()(
            jnp.asarray(anchors), level_counts, jnp.asarray(gt),
            jnp.zeros((3,), bool), jnp.ones((3,), jnp.int32),
        )
        assert (np.asarray(got.assigned_gt_inds) == 0).all()

    def test_anchor_valid_excluded(self):
        anchors, level_counts = self._grid_anchors()
        gt = np.asarray([[4.0, 4.0, 28.0, 28.0]], np.float32)
        valid = np.ones((anchors.shape[0],), bool)
        valid[: level_counts[0]] = False  # kill all level-0 anchors
        got = ATSSAssigner()(
            jnp.asarray(anchors), level_counts, jnp.asarray(gt),
            jnp.ones((1,), bool), jnp.ones((1,), jnp.int32),
            anchor_valid=jnp.asarray(valid),
        )
        out = np.asarray(got.assigned_gt_inds)
        assert (out[: level_counts[0]] == -1).all()  # ignored, not pos/neg

    def test_windowed_candidates_match_full_topk(self):
        """The analytic k x k grid-window candidate path must reproduce the
        full (G, N_l) distance top-k exactly — random gts, border-hugging
        gts, several topk values, with and without the valid-prefix mask."""
        gen = AnchorGenerator(
            strides=(8, 16), ratios=(1.0,), octave_base_scale=8.0,
            scales_per_octave=1,
        )
        sizes = [(12, 16), (6, 8)]
        anchors = jnp.asarray(gen.flat_anchors(sizes))
        level_counts = (12 * 16, 6 * 8)
        level_grids = tuple(
            (h, w, float(s)) for (h, w), s in zip(sizes, gen.strides)
        )
        acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
        acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
        rng = np.random.default_rng(11)
        for topk in (3, 4, 9):
            for trial in range(6):
                g = 8
                if trial < 3:
                    x1 = rng.uniform(0, 100, g)
                    y1 = rng.uniform(0, 80, g)
                else:
                    # hug the borders of the (un-padded) image region
                    x1 = rng.choice([0.0, 1.0, 60.0, 62.0], g)
                    y1 = rng.choice([0.0, 1.0, 40.0, 44.0], g)
                gt = np.stack(
                    [x1, y1, x1 + rng.uniform(6, 50, g),
                     y1 + rng.uniform(6, 50, g)], axis=-1,
                ).astype(np.float32)
                gt_valid = jnp.asarray(rng.random(g) < 0.8)
                labels = jnp.asarray(rng.integers(1, 5, g), jnp.int32)
                asg = ATSSAssigner(topk=topk)

                full = asg(anchors, level_counts, jnp.asarray(gt), gt_valid,
                           labels)
                win = asg(anchors, level_counts, jnp.asarray(gt), gt_valid,
                          labels, level_grids=level_grids)
                np.testing.assert_array_equal(
                    np.asarray(full.assigned_gt_inds),
                    np.asarray(win.assigned_gt_inds),
                )

                # valid-prefix case: anchors with centers inside (h, w) only
                img_hw = jnp.asarray([72.0, 100.0])
                av = (acx < img_hw[1]) & (acy < img_hw[0])
                full_v = asg(anchors, level_counts, jnp.asarray(gt), gt_valid,
                             labels, anchor_valid=av)
                win_v = asg(anchors, level_counts, jnp.asarray(gt), gt_valid,
                            labels, anchor_valid=av, level_grids=level_grids,
                            img_hw=img_hw)
                np.testing.assert_array_equal(
                    np.asarray(full_v.assigned_gt_inds),
                    np.asarray(win_v.assigned_gt_inds),
                )

    def test_jits(self):
        anchors, level_counts = self._grid_anchors()
        # gt sized to the level-0 anchors (64x64): with a much smaller gt all
        # nine nearest candidates tie at the same IoU and mean+std exceeds
        # the max — the genuine ATSS rule then assigns zero positives
        gt = jnp.asarray([[2.0, 2.0, 60.0, 60.0]], jnp.float32)

        @jax.jit
        def run(a, g):
            return ATSSAssigner()(
                a, level_counts, g, jnp.ones((1,), bool), jnp.ones((1,), jnp.int32)
            )

        res = run(jnp.asarray(anchors), gt)
        assert (np.asarray(res.assigned_gt_inds) > 0).any()


def tiny_atss(num_classes=4):
    return SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(
            type="FPN", in_channels=(128, 256, 512), out_channels=32, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True, relu_before_extra_convs=True,
        ),
        head=dict(
            type="ATSSHead", num_classes=num_classes, in_channels=32,
            feat_channels=32, stacked_convs=1,
        ),
    )


def tiny_cfg(**kw):
    kw.setdefault("num_classes", 4)
    kw.setdefault(
        "anchor_generator",
        AnchorGenerator(strides=(8, 16, 32, 64, 128), ratios=(1.0,),
                        octave_base_scale=8.0, scales_per_octave=1),
    )
    return ATSSConfig(**kw)


@pytest.fixture(scope="module")
def atss_setup():
    m = tiny_atss()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
    return m, vars_


class TestATSSTargets:
    def test_centerness_geometry(self):
        cfg = tiny_cfg()
        sizes = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
        anchors = cfg.anchor_generator.flat_anchors(sizes)
        counts = _level_counts(cfg, sizes)
        gt = jnp.asarray([[0.0, 0.0, 32.0, 32.0]])
        label0, matched, ctr = atss_targets(
            cfg, anchors, counts, jnp.ones((anchors.shape[0],), bool),
            gt, jnp.asarray([2], jnp.int32), jnp.asarray([True]),
        )
        label0 = np.asarray(label0)
        pos = label0 >= 0
        assert pos.any()
        assert (label0[pos] == 1).all()  # class 2 -> 0-based 1
        ctr = np.asarray(ctr)
        acx = np.asarray((anchors[:, 0] + anchors[:, 2]) / 2)
        acy = np.asarray((anchors[:, 1] + anchors[:, 3]) / 2)
        # hand-check one positive's centerness
        i = int(np.argmax(pos))
        l, t = acx[i] - 0.0, acy[i] - 0.0
        r, b = 32.0 - acx[i], 32.0 - acy[i]
        want = np.sqrt(
            (min(l, r) / max(l, r)) * (min(t, b) / max(t, b))
        )
        np.testing.assert_allclose(ctr[i], want, atol=1e-5)


class TestATSSDetector:
    def test_forward_shapes(self, atss_setup, rng):
        m, vars_ = atss_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg, ctr = m.apply(vars_, x)
        assert len(cls) == len(reg) == len(ctr) == 5
        assert cls[0].shape == (2, 8, 8, 4)
        assert reg[0].shape == (2, 8, 8, 4)
        assert ctr[0].shape == (2, 8, 8, 1)

    def test_loss_and_grads(self, atss_setup, rng):
        m, vars_ = atss_setup
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        gt_boxes = jnp.array(
            [[[4.0, 4.0, 30.0, 30.0], [0, 0, 0, 0]],
             [[10.0, 10.0, 50.0, 60.0], [2.0, 2.0, 20.0, 18.0]]]
        )
        gt_labels = jnp.array([[1, 0], [2, 3]], jnp.int32)
        gt_valid = jnp.array([[True, False], [True, True]])

        def loss_fn(params):
            cls, reg, ctr = m.apply(
                {"params": params, **{k: v for k, v in vars_.items() if k != "params"}}, x
            )
            losses = atss_loss(cfg, cls, reg, ctr, gt_boxes, gt_labels, gt_valid)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(vars_["params"])
        assert np.isfinite(float(loss))
        assert float(aux["num_pos"]) > 0
        gnorm = jax.tree_util.tree_reduce(lambda a, g: a + jnp.sum(jnp.abs(g)), grads, 0.0)
        assert float(gnorm) > 0
        assert float(jnp.sum(jnp.abs(grads["head"]["scales"]))) > 0

    def test_decode_shapes_and_validity(self, atss_setup, rng):
        m, vars_ = atss_setup
        cfg = tiny_cfg(max_detections=10, pre_nms_top_k=64, score_thr=0.0)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg, ctr = m.apply(vars_, x)
        dets = decode_atss(
            cfg, cls, reg, ctr,
            img_shapes=jnp.array([[60, 64], [64, 64]], jnp.float32),
            scale_factors=jnp.array([2.0, 1.0]),
        )
        assert dets.boxes.shape == (2, 10, 4)
        v = np.asarray(dets.valid)
        assert v.sum() > 0
        bx = np.asarray(dets.boxes)[v]
        assert np.isfinite(bx).all()
        assert (bx[:, 2] >= bx[:, 0]).all() and (bx[:, 3] >= bx[:, 1]).all()
        lab = np.asarray(dets.labels)
        assert ((lab[v] >= 0) & (lab[v] < 4)).all()

    def test_config_build_and_loss_fn(self):
        from torch_detection_tpu.builder import build_detection_cfg
        from torch_detection_tpu.utils import Config

        cfg_file = Config.fromfile("configs/atss_r50_fpn_coco.py")
        det = build_detection_cfg(cfg_file["detection"])
        assert isinstance(det, ATSSConfig)
        assert det.anchor_generator.num_base_anchors == 1
        assert det.assigner.topk == 9
        assert det.target_stds == (0.1, 0.1, 0.2, 0.2)

    def test_export_roundtrip(self, tmp_path, rng):
        import os

        from torch_detection_tpu.engine.export import (
            export_serving, load_serving, save_serving,
        )

        m = tiny_atss()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
        cfg = tiny_cfg(max_detections=10, pre_nms_top_k=64, score_thr=0.0)
        exported = export_serving(m, cfg, vars_, batch=1, canvas=(64, 64),
                                  compute_dtype=jnp.float32)
        path = os.path.join(tmp_path, "atss.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert served["boxes"].shape == (1, 10, 4)
        assert np.asarray(served["valid"]).sum() > 0

    def test_decode_jits(self, atss_setup, rng):
        m, vars_ = atss_setup
        cfg = tiny_cfg(max_detections=10, pre_nms_top_k=64)

        @jax.jit
        def infer(vars_, x):
            cls, reg, ctr = m.apply(vars_, x)
            return decode_atss(cfg, cls, reg, ctr)

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        dets = infer(vars_, x)
        assert dets.boxes.shape == (1, 10, 4)
