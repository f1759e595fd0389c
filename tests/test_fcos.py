"""FCOS (anchor-free) family: points, target assignment, loss, decode.

Covers ``models/heads/fcos_head.py`` and ``models/detectors/fcos.py`` —
the fourth detector family; the reference has no detector tier at all
(SURVEY.md §2 #33)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models.detectors import (
    FCOSConfig,
    SingleStageDetector,
    decode_fcos,
    fcos_loss,
)
from torch_detection_tpu.models.detectors.fcos import (
    _flat_points,
    fcos_targets,
    level_points,
)


def tiny_fcos(num_classes=4):
    return SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(
            type="FPN", in_channels=(128, 256, 512), out_channels=32, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True, relu_before_extra_convs=True,
        ),
        head=dict(
            type="FCOSHead", num_classes=num_classes, in_channels=32,
            feat_channels=32, stacked_convs=1,
        ),
    )


@pytest.fixture(scope="module")
def fcos_setup():
    m = tiny_fcos()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
    return m, vars_


@pytest.mark.core
class TestPointsAndTargets:
    def test_level_points_geometry(self):
        p = np.asarray(level_points((2, 3), 8))
        assert p.shape == (6, 2)
        np.testing.assert_allclose(p[0], [4.0, 4.0])  # (0.5*8, 0.5*8)
        np.testing.assert_allclose(p[1], [12.0, 4.0])
        np.testing.assert_allclose(p[3], [4.0, 12.0])

    def test_target_assignment_rules(self):
        cfg = FCOSConfig(num_classes=3)
        points, ranges = _flat_points(cfg, [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)])
        # one small gt (range of level 0) and one large gt containing it
        gt = jnp.array([[8.0, 8.0, 40.0, 40.0], [0.0, 0.0, 64.0, 64.0]])
        labels = jnp.array([2, 1], jnp.int32)
        valid = jnp.array([True, True])
        label0, tgt, ctr = fcos_targets(cfg, points, ranges, gt, labels, valid)
        label0 = np.asarray(label0)
        # the point at (20, 20) on level 0 lies in both; max ltrb of the small
        # box there is 20 <= 64 -> in range; min-area rule picks the SMALL one
        p_np = np.asarray(points)
        i = int(np.argmin(np.abs(p_np - np.array([20.0, 20.0])).sum(-1)))
        assert label0[i] == 1  # class 2 -> 0-based 1
        # near the small box's center ON ITS LEVEL (level 0 = first 64
        # points; the exact center (24, 24) is a level-1 point where the
        # box is out of regression range — correct FCOS level routing)
        ctr_np = np.asarray(ctr)
        # nearest level-0 point is (20, 20): ltrb (12, 12, 20, 20) ->
        # centerness sqrt(0.6 * 0.6) = 0.6 exactly
        j = int(np.argmin(np.abs(p_np[:64] - np.array([24.0, 24.0])).sum(-1)))
        np.testing.assert_allclose(ctr_np[j], 0.6, atol=1e-5)
        # a point outside every box is background
        k = int(np.argmin(np.abs(p_np - np.array([500.0, 500.0])).sum(-1)))
        assert label0[k] == -1 or not (0 <= p_np[k][0] <= 64)

    def test_invalid_gt_ignored(self):
        cfg = FCOSConfig(num_classes=3)
        points, ranges = _flat_points(cfg, [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)])
        gt = jnp.array([[0.0, 0.0, 64.0, 64.0]])
        label0, _, _ = fcos_targets(
            cfg, points, ranges, gt, jnp.array([1], jnp.int32), jnp.array([False])
        )
        assert (np.asarray(label0) == -1).all()


class TestFCOSDetector:
    def test_forward_shapes(self, fcos_setup, rng):
        m, vars_ = fcos_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg, ctr = m.apply(vars_, x)
        assert len(cls) == len(reg) == len(ctr) == 5
        assert cls[0].shape == (2, 8, 8, 4)
        assert reg[0].shape == (2, 8, 8, 4)
        assert ctr[0].shape == (2, 8, 8, 1)

    def test_loss_and_grads(self, fcos_setup, rng):
        m, vars_ = fcos_setup
        cfg = FCOSConfig(num_classes=4)
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
            losses = fcos_loss(cfg, cls, reg, ctr, gt_boxes, gt_labels, gt_valid)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(vars_["params"])
        assert np.isfinite(float(loss))
        assert float(aux["num_pos"]) > 0
        gnorm = jax.tree_util.tree_reduce(lambda a, g: a + jnp.sum(jnp.abs(g)), grads, 0.0)
        assert float(gnorm) > 0
        # per-level scales must receive gradient through the reg branch
        assert float(jnp.sum(jnp.abs(grads["head"]["scales"]))) > 0

    def test_decode_shapes_and_validity(self, fcos_setup, rng):
        m, vars_ = fcos_setup
        cfg = FCOSConfig(num_classes=4, max_detections=10, pre_nms_top_k=64, score_thr=0.0)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg, ctr = m.apply(vars_, x)
        dets = decode_fcos(
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

    def test_config_and_export_roundtrip(self, tmp_path, rng):
        from torch_detection_tpu.builder import build_detection_cfg, build_loss_fn
        from torch_detection_tpu.engine.export import (
            export_serving, load_serving, save_serving,
        )
        from torch_detection_tpu.utils import Config

        cfg_file = Config.fromfile("configs/fcos_r50_fpn_coco.py")
        det = build_detection_cfg(cfg_file["detection"])
        assert isinstance(det, FCOSConfig)

        # serving export on the tiny model
        import dataclasses, os

        m = tiny_fcos()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
        tiny_cfg = FCOSConfig(num_classes=4, max_detections=10,
                              pre_nms_top_k=64, score_thr=0.0)
        exported = export_serving(m, tiny_cfg, vars_, batch=1, canvas=(64, 64),
                                  compute_dtype=jnp.float32)
        path = os.path.join(tmp_path, "fcos.jaxexp")
        save_serving(exported, path)
        img = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
        served = load_serving(path)(
            img, np.asarray([[64, 64]], np.int32), np.ones((1,), np.float32)
        )
        assert served["boxes"].shape == (1, 10, 4)
        assert np.asarray(served["valid"]).sum() > 0

    def test_decode_jits(self, fcos_setup, rng):
        m, vars_ = fcos_setup
        cfg = FCOSConfig(num_classes=4, max_detections=10, pre_nms_top_k=64)

        @jax.jit
        def infer(vars_, x):
            cls, reg, ctr = m.apply(vars_, x)
            return decode_fcos(cfg, cls, reg, ctr)

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        dets = infer(vars_, x)
        assert dets.boxes.shape == (1, 10, 4)
