"""YOLOX tests: SimOTA oracle, decode, loss/grads, builder + export dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models.detectors import (
    SingleStageDetector,
    YOLOXConfig,
    decode_yolox,
    simota_assign,
    yolox_loss,
)
from torch_detection_tpu.models.detectors.yolox import (
    _decode_boxes,
    _flat_grid,
)


def _model(num_classes=3):
    return SingleStageDetector(
        backbone=dict(type="CSPDarknet", deepen_factor=0.33, widen_factor=0.125,
                      out_indices=(2, 3, 4)),
        neck=dict(type="YOLOXPAFPN", in_channels=(32, 64, 128), out_channels=32,
                  num_csp_blocks=1),
        head=dict(type="YOLOXHead", num_classes=num_classes, in_channels=32,
                  feat_channels=32, stacked_convs=1),
    )


@pytest.fixture(scope="module")
def yx_setup():
    model = _model()
    cfg = YOLOXConfig(num_classes=3, max_detections=8, pre_nms_top_k=64)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, cfg, variables


def _batch(rng):
    return {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "gt_boxes": jnp.array(
            [[[8.0, 8.0, 30.0, 30.0], [0, 0, 0, 0]],
             [[10.0, 10.0, 50.0, 60.0], [2.0, 2.0, 20.0, 18.0]]]
        ),
        "gt_labels": jnp.array([[1, 0], [2, 3]], jnp.int32),
        "gt_valid": jnp.array([[True, False], [True, True]]),
    }


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _simota_oracle(cfg, cls_logits, obj_logits, boxes, grid, strides,
                   gt_boxes, gt_labels, gt_valid):
    """Loop-faithful numpy port of the official get_assignments."""
    n, c = cls_logits.shape
    g = len(gt_boxes)
    centers = grid + 0.5 * strides[:, None]
    in_box = np.zeros((n, g), bool)
    in_center = np.zeros((n, g), bool)
    for j in range(g):
        x1, y1, x2, y2 = gt_boxes[j]
        in_box[:, j] = ((centers[:, 0] > x1) & (centers[:, 0] < x2)
                        & (centers[:, 1] > y1) & (centers[:, 1] < y2))
        cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
        r = cfg.center_radius * strides
        in_center[:, j] = ((np.abs(centers[:, 0] - cx) < r)
                           & (np.abs(centers[:, 1] - cy) < r))
    cand = (in_box | in_center) & gt_valid[None, :]
    both = in_box & in_center

    def iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[0] * wh[1]
        ua = max((a[2] - a[0]) * (a[3] - a[1]), 0) + max(
            (b[2] - b[0]) * (b[3] - b[1]), 0) - inter
        return inter / max(ua, 1e-6)

    ious = np.array([[iou(boxes[i], gt_boxes[j]) for j in range(g)]
                     for i in range(n)])
    p = np.sqrt(_sigmoid(cls_logits) * _sigmoid(obj_logits)[:, None])
    p = np.clip(p, 1e-8, 1 - 1e-8)
    cost = np.full((n, g), np.inf)
    for j in range(g):
        lab = min(max(gt_labels[j] - 1, 0), c - 1)
        onehot = np.zeros(c)
        onehot[lab] = 1.0
        for i in range(n):
            if not cand[i, j]:
                continue
            bce = -(onehot * np.log(p[i]) + (1 - onehot) * np.log(1 - p[i])).sum()
            cost[i, j] = (bce + cfg.iou_cost_weight * -np.log(ious[i, j] + 1e-8)
                          + (0.0 if both[i, j] else 1e5))

    selected = np.zeros((n, g), bool)
    for j in range(g):
        if not gt_valid[j]:
            continue
        cand_j = np.where(cand[:, j])[0]
        if len(cand_j) == 0:
            continue
        top = np.sort(ious[cand_j, j])[::-1][: cfg.candidate_topk]
        k = int(np.clip(int(top.sum()), 1, cfg.candidate_topk))
        k = min(k, len(cand_j))
        order = cand_j[np.argsort(cost[cand_j, j])]
        selected[order[:k], j] = True
    fg = selected.any(1)
    matched = np.zeros(n, np.int32)
    for i in range(n):
        if fg[i]:
            js = np.where(selected[i])[0]
            matched[i] = js[np.argmin(cost[i, js])]
    return fg, matched


@pytest.mark.core
class TestSimOTA:
    def test_against_oracle(self, rng):
        cfg = YOLOXConfig(num_classes=4)
        featmap_sizes = [(8, 8), (4, 4), (2, 2)]
        grid, strides = _flat_grid(cfg, featmap_sizes)
        grid, strides = np.asarray(grid), np.asarray(strides)
        n = grid.shape[0]
        g = 5
        cls_logits = rng.normal(size=(n, 4)).astype(np.float32)
        obj_logits = rng.normal(size=(n,)).astype(np.float32)
        reg = rng.normal(size=(n, 4)).astype(np.float32) * 0.5
        boxes = np.asarray(_decode_boxes(
            jnp.asarray(reg), jnp.asarray(grid), jnp.asarray(strides)))
        p0 = rng.uniform(0, 40, (g, 2))
        wh = rng.uniform(8, 30, (g, 2))
        gt_boxes = np.concatenate([p0, np.minimum(p0 + wh, 63)], -1).astype(np.float32)
        gt_labels = rng.integers(1, 5, (g,)).astype(np.int32)
        gt_valid = rng.random(g) < 0.8

        fg, matched, m_iou = simota_assign(
            cfg, jnp.asarray(cls_logits), jnp.asarray(obj_logits),
            jnp.asarray(boxes), jnp.asarray(grid), jnp.asarray(strides),
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        )
        want_fg, want_matched = _simota_oracle(
            cfg, cls_logits, obj_logits, boxes, grid, strides,
            gt_boxes, gt_labels, gt_valid,
        )
        np.testing.assert_array_equal(np.asarray(fg), want_fg)
        np.testing.assert_array_equal(
            np.asarray(matched)[want_fg], want_matched[want_fg]
        )

    def test_invalid_gts_get_nothing(self, rng):
        cfg = YOLOXConfig(num_classes=2)
        grid, strides = _flat_grid(cfg, [(8, 8), (4, 4), (2, 2)])
        n = grid.shape[0]
        fg, matched, _ = simota_assign(
            cfg, jnp.zeros((n, 2)), jnp.zeros((n,)),
            jnp.tile(jnp.asarray([[0.0, 0.0, 10.0, 10.0]]), (n, 1)),
            grid, strides,
            jnp.asarray([[4.0, 4.0, 30.0, 30.0]]),
            jnp.asarray([1], jnp.int32), jnp.asarray([False]),
        )
        assert int(jnp.sum(fg)) == 0


class TestYOLOXLossDecode:
    def test_loss_grads(self, yx_setup, rng):
        model, cfg, variables = yx_setup
        batch = _batch(rng)

        def loss_fn(params):
            cls, reg, obj = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                batch["image"], train=True,
            )
            l = yolox_loss(cfg, cls, reg, obj, batch["gt_boxes"],
                           batch["gt_labels"], batch["gt_valid"])
            return l["loss"], l

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        assert np.isfinite(float(loss)) and float(aux["num_pos"]) > 0
        for key in ("head", "neck", "backbone"):
            gsum = jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.abs(g).sum(), grads[key], 0.0)
            assert float(gsum) > 0 and np.isfinite(float(gsum)), key

    def test_padded_gt_invariance(self, yx_setup, rng):
        model, cfg, variables = yx_setup
        batch = _batch(rng)
        cls, reg, obj = model.apply(variables, batch["image"], train=True)
        l1 = yolox_loss(cfg, cls, reg, obj, batch["gt_boxes"],
                        batch["gt_labels"], batch["gt_valid"])
        b2 = dict(batch)
        b2["gt_boxes"] = jnp.concatenate([batch["gt_boxes"], jnp.full((2, 3, 4), 11.0)], 1)
        b2["gt_labels"] = jnp.concatenate([batch["gt_labels"], jnp.ones((2, 3), jnp.int32)], 1)
        b2["gt_valid"] = jnp.concatenate([batch["gt_valid"], jnp.zeros((2, 3), bool)], 1)
        l2 = yolox_loss(cfg, cls, reg, obj, b2["gt_boxes"], b2["gt_labels"], b2["gt_valid"])
        np.testing.assert_allclose(float(l1["loss"]), float(l2["loss"]), rtol=1e-6)

    def test_decode_protocol(self, yx_setup, rng):
        model, cfg, variables = yx_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)

        @jax.jit
        def run(v, x):
            cls, reg, obj = model.apply(v, x)
            return decode_yolox(cfg, cls, reg, obj,
                                img_shapes=jnp.array([[64.0, 64.0]] * 2),
                                scale_factors=jnp.array([1.0, 2.0]))

        d = run(variables, x)
        assert d.boxes.shape == (2, 8, 4)
        lab = np.asarray(d.labels)
        v = np.asarray(d.valid)
        assert ((lab[v] >= 0) & (lab[v] < 3)).all()

    def test_use_l1_adds_term(self, yx_setup, rng):
        model, cfg, variables = yx_setup
        batch = _batch(rng)
        cls, reg, obj = model.apply(variables, batch["image"], train=True)
        l0 = yolox_loss(cfg, cls, reg, obj, batch["gt_boxes"],
                        batch["gt_labels"], batch["gt_valid"])
        import dataclasses
        cfg1 = dataclasses.replace(cfg, use_l1=True)
        l1 = yolox_loss(cfg1, cls, reg, obj, batch["gt_boxes"],
                        batch["gt_labels"], batch["gt_valid"])
        assert float(l1["loss_reg"]) > float(l0["loss_reg"])


class TestYOLOXBuilder:
    def test_build_from_config_file(self):
        import os

        from torch_detection_tpu.builder import build_detection_cfg, build_detector
        from torch_detection_tpu.utils.config import Config

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cfg = Config.fromfile(os.path.join(repo, "configs", "yolox_s_coco.py"))
        det_cfg = build_detection_cfg(cfg["detection"])
        assert isinstance(det_cfg, YOLOXConfig)
        assert det_cfg.strides == (8, 16, 32)
        model = build_detector(cfg["model"], compute_dtype="bfloat16")
        assert isinstance(model, SingleStageDetector)

    def test_loss_fn_and_dispatch(self, yx_setup, rng):
        from torch_detection_tpu.builder import build_loss_fn
        from torch_detection_tpu.engine.validate import make_inference_fn

        model, cfg, variables = yx_setup
        loss_fn = build_loss_fn(model, cfg)
        loss, aux = loss_fn(variables["params"],
                            variables.get("batch_stats", {}), _batch(rng))
        assert np.isfinite(float(loss)) and "loss_obj" in aux
        assert make_inference_fn(model, cfg) is not None
