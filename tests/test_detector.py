import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models.detectors import (
    RetinaNetConfig,
    SingleStageDetector,
    decode_detections,
    retina_loss,
)
from torch_detection_tpu.ops.anchors import AnchorGenerator


def tiny_detector(num_classes=4):
    return SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(1, 2, 3)),
        neck=dict(
            type="FPN", in_channels=(128, 256, 512), out_channels=32, num_outs=5,
            add_extra_convs=True, extra_convs_on_inputs=True, relu_before_extra_convs=True,
        ),
        head=dict(
            type="RetinaHead", num_classes=num_classes, in_channels=32,
            feat_channels=32, stacked_convs=1, num_base_anchors=9,
        ),
    )


def tiny_cfg(num_classes=4):
    return RetinaNetConfig(
        num_classes=num_classes,
        anchor_generator=AnchorGenerator(
            strides=(8, 16, 32, 64, 128), ratios=(0.5, 1.0, 2.0),
            octave_base_scale=4.0, scales_per_octave=3,
        ),
        max_detections=10,
        pre_nms_top_k=200,
    )


@pytest.fixture(scope="module")
def det_setup():
    m = tiny_detector()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    vars_ = jax.jit(lambda k, x: m.init(k, x))(jax.random.PRNGKey(0), x)
    return m, vars_


class TestDetector:
    @pytest.mark.core
    def test_forward_shapes(self, det_setup, rng):
        m, vars_ = det_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls_scores, bbox_preds = m.apply(vars_, x)
        assert len(cls_scores) == 5 and len(bbox_preds) == 5
        assert cls_scores[0].shape == (2, 8, 8, 9 * 4)
        assert bbox_preds[0].shape == (2, 8, 8, 9 * 4)
        assert cls_scores[4].shape[1:3] == (1, 1)

    def test_loss_runs_and_grads(self, det_setup, rng):
        m, vars_ = det_setup
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        gt_boxes = jnp.array(
            [[[4.0, 4.0, 30.0, 30.0], [0.0, 0.0, 0.0, 0.0]],
             [[10.0, 10.0, 50.0, 60.0], [2.0, 2.0, 20.0, 18.0]]]
        )
        gt_labels = jnp.array([[1, 0], [2, 3]], jnp.int32)
        gt_valid = jnp.array([[True, False], [True, True]])

        def loss_fn(params):
            cls, reg = m.apply({"params": params, "batch_stats": vars_["batch_stats"]}, x)
            losses = retina_loss(cfg, cls, reg, gt_boxes, gt_labels, gt_valid)
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(vars_["params"])
        assert np.isfinite(float(loss))
        assert float(aux["num_pos"]) > 0
        gnorm = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(jnp.abs(g)), grads, 0.0
        )
        assert float(gnorm) > 0

    def test_loss_no_gt_is_finite(self, det_setup):
        m, vars_ = det_setup
        cfg = tiny_cfg()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        cls, reg = m.apply(vars_, x)
        losses = retina_loss(
            cfg, cls, reg,
            jnp.zeros((1, 2, 4)), jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2), bool),
        )
        assert np.isfinite(float(losses["loss"]))
        assert float(losses["num_pos"]) == 0

    def test_decode_shapes_and_validity(self, det_setup, rng):
        m, vars_ = det_setup
        cfg = tiny_cfg()
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg = m.apply(vars_, x)
        dets = decode_detections(
            cfg, cls, reg,
            img_shapes=jnp.array([[60, 64], [64, 64]], jnp.float32),
            scale_factors=jnp.array([2.0, 1.0]),
        )
        assert dets.boxes.shape == (2, 10, 4)
        assert dets.scores.shape == (2, 10)
        assert dets.labels.shape == (2, 10)
        v = np.asarray(dets.valid)
        s = np.asarray(dets.scores)
        assert (s[~v] == 0).all()
        lab = np.asarray(dets.labels)
        assert ((lab[v] >= 0) & (lab[v] < 4)).all()

    def test_decode_jits(self, det_setup, rng):
        m, vars_ = det_setup
        cfg = tiny_cfg()

        @jax.jit
        def infer(vars_, x):
            cls, reg = m.apply(vars_, x)
            return decode_detections(cfg, cls, reg)

        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        dets = infer(vars_, x)
        assert dets.boxes.shape == (1, 10, 4)

    def test_decode_approx_and_bf16_preselect(self, det_setup, rng):
        # force the per-level preselect branch (k < n_l) with a small k, on
        # bf16 head outputs (top_k runs in the head's native dtype), with
        # and without approx_top_k — both must yield valid fixed-shape output
        m, vars_ = det_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        cls, reg = m.apply(vars_, x)
        cls = [c.astype(jnp.bfloat16) for c in cls]
        reg = [r.astype(jnp.bfloat16) for r in reg]
        base = dict(
            num_classes=4,
            anchor_generator=tiny_cfg().anchor_generator,
            max_detections=10, pre_nms_top_k=64, pre_select_per_level=32,
            score_thr=0.0,  # random-init head sits at the focal bias ~0.01
        )
        exact = decode_detections(RetinaNetConfig(**base), cls, reg)
        approx = decode_detections(
            RetinaNetConfig(**base, approx_top_k=True), cls, reg
        )
        for dets in (exact, approx):
            assert dets.boxes.shape == (2, 10, 4)
            v = np.asarray(dets.valid)
            assert v.sum() > 0
            assert np.isfinite(np.asarray(dets.boxes)[v]).all()
        # the two candidate pools overlap heavily -> top detections agree
        se = np.asarray(exact.scores)[np.asarray(exact.valid)]
        sa = np.asarray(approx.scores)[np.asarray(approx.valid)]
        np.testing.assert_allclose(se[:3], sa[:3], rtol=1e-2)

    @pytest.mark.core
    def test_loss_detects_matching_anchor(self, det_setup):
        """A gt that exactly matches an anchor must produce >= 1 positive."""
        m, vars_ = det_setup
        cfg = tiny_cfg()
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        cls, reg = m.apply(vars_, x)
        # anchor at stride 8, scale 4 -> 32x32 box at cell (2, 2): center (16, 16)
        gt = jnp.array([[[0.0, 0.0, 32.0, 32.0]]])
        losses = retina_loss(
            cfg, cls, reg, gt, jnp.array([[1]], jnp.int32), jnp.array([[True]])
        )
        assert float(losses["num_pos"]) >= 1
