"""YOLOv3 family: anchors, grid assignment, coder, loss, decode, builder.

Covers ``ops/anchors.py::YOLOAnchorGenerator``, ``ops/assign.py::GridAssigner``,
``models/backbones/darknet.py``, ``models/necks/yolo_neck.py``,
``models/heads/yolo_head.py`` and ``models/detectors/yolov3.py`` — the eighth
detector family (the reference has no detector tier, SURVEY.md §2 #33)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_detection_tpu.models.detectors import (
    SingleStageDetector,
    YOLOV3Config,
    decode_yolo,
    yolo_loss,
)
from torch_detection_tpu.models.detectors.yolov3 import yolo_decode, yolo_encode
from torch_detection_tpu.ops.anchors import YOLOAnchorGenerator
from torch_detection_tpu.ops.assign import GridAssigner

TINY_GEN = YOLOAnchorGenerator(
    strides=(16, 8),
    base_sizes=(((40.0, 30.0), (24.0, 48.0)), ((12.0, 10.0), (8.0, 16.0))),
)


def _tiny_model(num_classes=5):
    return SingleStageDetector(
        backbone=dict(
            type="Darknet", depth=53, stages=(1, 1, 1, 1, 1), base_channels=8,
            out_indices=(2, 3, 4),
        ),
        neck=dict(type="YOLOV3Neck", in_channels=(64, 128, 256),
                  out_channels=(64, 32, 16)),
        head=dict(type="YOLOV3Head", num_classes=num_classes,
                  in_channels=(64, 32, 16), out_channels=(128, 64, 32)),
    )


class TestYOLOAnchors:
    def test_base_anchors_cell_centered(self):
        gen = YOLOAnchorGenerator()
        base = np.asarray(gen.base_anchors_for_level(0))  # stride 32
        assert base.shape == (3, 4)
        # centered on (16, 16) with the canonical (116, 90) first prior
        np.testing.assert_allclose(
            base[0], [16 - 58, 16 - 45, 16 + 58, 16 + 45])

    def test_flat_counts_and_strides(self):
        sizes = [(2, 3), (4, 6)]
        flat = np.asarray(TINY_GEN.flat_anchors(sizes))
        assert flat.shape == (2 * 3 * 2 + 4 * 6 * 2, 4)
        strides = np.asarray(TINY_GEN.flat_strides(sizes))
        assert strides.shape == (flat.shape[0],)
        assert (strides[: 2 * 3 * 2] == 16).all()
        assert (strides[2 * 3 * 2:] == 8).all()

    def test_responsible_flags_mark_center_cell(self):
        sizes = [(2, 3), (4, 6)]
        gt = jnp.array([[18.0, 10.0, 28.0, 20.0]])  # center (23, 15)
        flags = np.asarray(
            TINY_GEN.responsible_flags(sizes, gt, jnp.ones((1,), bool))
        )
        # stride 16: cell (0, 1) -> flat cell 1 -> anchors 2, 3
        lvl0 = flags[: 2 * 3 * 2].reshape(2 * 3, 2)
        assert lvl0[1].all() and lvl0.sum() == 2
        # stride 8: cell (1, 2) -> flat cell 1*6+2=8
        lvl1 = flags[2 * 3 * 2:].reshape(4 * 6, 2)
        assert lvl1[8].all() and lvl1.sum() == 2

    def test_invalid_gt_is_not_responsible(self):
        sizes = [(2, 3), (4, 6)]
        gt = jnp.array([[18.0, 10.0, 28.0, 20.0]])
        flags = TINY_GEN.responsible_flags(sizes, gt, jnp.zeros((1,), bool))
        assert not bool(jnp.any(flags))


class TestGridAssigner:
    def _setup(self):
        sizes = [(2, 3), (4, 6)]
        anchors = TINY_GEN.flat_anchors(sizes)
        return sizes, anchors

    def test_best_responsible_anchor_owns_gt(self):
        sizes, anchors = self._setup()
        # gt matching the level-1 (8, 16) prior at cell (1, 2) decently
        gt = jnp.array([[19.0, 8.0, 27.0, 24.0]])
        gv = jnp.ones((1,), bool)
        resp = TINY_GEN.responsible_flags(sizes, gt, gv)
        res = GridAssigner()(anchors, resp, gt, gv, jnp.array([3], jnp.int32))
        assigned = np.asarray(res.assigned_gt_inds)
        pos = np.nonzero(assigned > 0)[0]
        assert len(pos) >= 1
        # every positive is responsible
        assert np.asarray(resp)[pos].all()
        assert (np.asarray(res.labels)[pos] == 3).all()

    def test_non_responsible_overlap_is_ignored_not_negative(self):
        sizes, anchors = self._setup()
        gt = jnp.array([[19.0, 8.0, 27.0, 24.0]])
        gv = jnp.ones((1,), bool)
        resp = TINY_GEN.responsible_flags(sizes, gt, gv)
        res = GridAssigner(neg_iou_thr=0.3)(
            anchors, resp, gt, gv, jnp.array([1], jnp.int32)
        )
        assigned = np.asarray(res.assigned_gt_inds)
        overlaps = np.asarray(res.max_overlaps)
        high = (overlaps >= 0.3) & ~np.asarray(resp) & (assigned <= 0)
        assert (assigned[high] == -1).all()

    def test_no_gt_all_negative(self):
        sizes, anchors = self._setup()
        gt = jnp.zeros((1, 4))
        gv = jnp.zeros((1,), bool)
        resp = TINY_GEN.responsible_flags(sizes, gt, gv)
        res = GridAssigner()(anchors, resp, gt, gv, jnp.array([0], jnp.int32))
        assert (np.asarray(res.assigned_gt_inds) == 0).all()


class TestYOLOCoder:
    def test_encode_decode_roundtrip(self):
        sizes = [(2, 3), (4, 6)]
        anchors = TINY_GEN.flat_anchors(sizes)
        strides = TINY_GEN.flat_strides(sizes)
        rng = np.random.RandomState(0)
        n = anchors.shape[0]
        acx = np.asarray(0.5 * (anchors[:, 0] + anchors[:, 2]))
        acy = np.asarray(0.5 * (anchors[:, 1] + anchors[:, 3]))
        # gts with centers inside each anchor's cell and sizes near the prior
        cx = acx + rng.uniform(-0.45, 0.45, n) * np.asarray(strides)
        cy = acy + rng.uniform(-0.45, 0.45, n) * np.asarray(strides)
        w = (np.asarray(anchors[:, 2] - anchors[:, 0]) + 1) * rng.uniform(0.5, 2.0, n)
        h = (np.asarray(anchors[:, 3] - anchors[:, 1]) + 1) * rng.uniform(0.5, 2.0, n)
        gt = jnp.asarray(
            np.stack([cx - (w - 1) / 2, cy - (h - 1) / 2,
                      cx + (w - 1) / 2, cy + (h - 1) / 2], axis=-1)
        )
        t = yolo_encode(anchors, strides, gt)
        # invert the sigmoid the decoder applies to xy
        raw = jnp.concatenate(
            [jnp.log(t[:, :2] / (1 - t[:, :2])), t[:, 2:]], axis=-1
        )
        back = yolo_decode(anchors, strides, raw)
        np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-3)


class TestYOLOV3Model:
    def test_shapes(self):
        model = _tiny_model()
        x = jnp.zeros((2, 64, 96, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        outs = model.apply(variables, x)
        # coarse -> fine, A*(5+C) = 2? no: 3 anchors, 5+5 channels
        assert [o.shape for o in outs] == [
            (2, 2, 3, 30), (2, 4, 6, 30), (2, 8, 12, 30)]

    def test_loss_and_grads_finite(self):
        model = _tiny_model()
        cfg = YOLOV3Config(
            num_classes=5,
            anchor_generator=YOLOAnchorGenerator(
                strides=(32, 16, 8),
                base_sizes=(((40.0, 30.0),) * 3, ((24.0, 20.0),) * 3,
                            ((12.0, 10.0),) * 3),
            ),
        )
        x = jnp.zeros((2, 64, 96, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        gt = jnp.array([[[4.0, 4.0, 30.0, 40.0], [50.0, 10.0, 90.0, 60.0]]] * 2)
        gl = jnp.array([[1, 3]] * 2, jnp.int32)
        gv = jnp.ones((2, 2), bool)

        def loss_of(params):
            outs = model.apply(
                {"params": params, "batch_stats": variables.get("batch_stats", {})},
                x, train=True,
            )
            return yolo_loss(cfg, outs, gt, gl, gv)["loss"]

        loss, grads = jax.jit(jax.value_and_grad(loss_of))(variables["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_overfit_two_boxes(self):
        model = _tiny_model()
        cfg = YOLOV3Config(
            num_classes=5,
            anchor_generator=YOLOAnchorGenerator(
                strides=(32, 16, 8),
                base_sizes=(((40.0, 30.0),) * 3, ((24.0, 20.0),) * 3,
                            ((12.0, 10.0),) * 3),
            ),
            score_thr=0.1,
        )
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32))
        gt = jnp.array([[[8.0, 8.0, 40.0, 36.0], [56.0, 24.0, 84.0, 52.0]]])
        gl = jnp.array([[2, 4]], jnp.int32)
        gv = jnp.ones((1, 2), bool)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
        tx = optax.adam(2e-3)
        opt_state = tx.init(variables["params"])

        @jax.jit
        def step(params, opt_state):
            def loss_of(p):
                outs = model.apply(
                    {"params": p, "batch_stats": variables.get("batch_stats", {})},
                    img, train=True,
                )
                return yolo_loss(cfg, outs, gt, gl, gv)["loss"]

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        params = variables["params"]
        first = None
        for i in range(150):
            params, opt_state, loss = step(params, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.25 * first, (first, float(loss))

        outs = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})}, img
        )
        det = decode_yolo(cfg, outs)
        assert det.boxes.shape == (1, cfg.max_detections, 4)
        kept = np.asarray(det.valid[0])
        labels = np.asarray(det.labels[0])[kept]
        # both objects recovered with the right (0-based) classes
        assert {1, 3} <= set(labels.tolist())


class TestBuilder:
    def test_config_roundtrip(self):
        from torch_detection_tpu.builder import build_detection_cfg

        cfg = build_detection_cfg(dict(
            style="yolo",
            num_classes=7,
            anchor=dict(
                strides=[32, 16, 8],
                base_sizes=[
                    [[116, 90], [156, 198], [373, 326]],
                    [[30, 61], [62, 45], [59, 119]],
                    [[10, 13], [16, 30], [33, 23]],
                ],
            ),
            assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.6),
            conf_thr=0.01,
            nms_iou_thr=0.4,
            approx_top_k=True,
        ))
        assert isinstance(cfg, YOLOV3Config)
        assert cfg.num_classes == 7
        assert cfg.anchor_generator.strides == (32, 16, 8)
        assert cfg.assigner.pos_iou_thr == 0.6
        assert cfg.conf_thr == 0.01 and cfg.approx_top_k
