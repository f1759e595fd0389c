"""Cascade R-CNN tests: per-stage losses/grads, refinement, inference, builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models.detectors import (
    CascadeRCNN,
    CascadeRCNNConfig,
    cascade_rcnn_inference,
    cascade_rcnn_loss,
)
from torch_detection_tpu.models.heads import ProposalConfig
from torch_detection_tpu.ops.anchors import AnchorGenerator


@pytest.fixture(scope="module")
def cascade_setup():
    model = CascadeRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=3, fc_channels=32),
        num_stages=3,
    )
    cfg = CascadeRCNNConfig(
        num_classes=3,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=64, post_nms_top_k=32),
        proposal_test=ProposalConfig(pre_nms_per_level=64, post_nms_top_k=32),
        rpn_num_samples=32,
        rcnn_num_samples=16,
        max_detections=8,
    )
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(0), x)
    roi_feats = jnp.zeros((2, 16, 7, 7, 16), jnp.float32)
    vars2 = model.init(
        jax.random.PRNGKey(1), roi_feats, method=CascadeRCNN.roi_forward_all
    )
    merged = {
        "params": {**variables["params"], **vars2["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }
    return model, cfg, merged


def _batch(rng):
    return {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "gt_boxes": jnp.array(
            [[[4.0, 4.0, 30.0, 30.0], [0, 0, 0, 0]],
             [[10.0, 10.0, 50.0, 60.0], [2.0, 2.0, 20.0, 18.0]]]
        ),
        "gt_labels": jnp.array([[1, 0], [2, 3]], jnp.int32),
        "gt_valid": jnp.array([[True, False], [True, True]]),
        "img_shape": jnp.array([[64, 64], [64, 64]], jnp.float32),
    }


class TestCascadeConfig:
    def test_stage_assigner_thresholds(self):
        cfg = CascadeRCNNConfig()
        for t, thr in enumerate((0.5, 0.6, 0.7)):
            a = cfg.stage_assigner(t)
            assert a.pos_iou_thr == a.neg_iou_thr == a.min_pos_iou == thr

    def test_all_stage_heads_have_params(self, cascade_setup):
        _, _, variables = cascade_setup
        for t in range(3):
            assert f"bbox_head{t}" in variables["params"], t


class TestCascadeLoss:
    def test_loss_and_grads_reach_every_stage(self, cascade_setup, rng):
        model, cfg, variables = cascade_setup
        batch = _batch(rng)

        def loss_fn(params):
            losses = cascade_rcnn_loss(
                cfg, model,
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, jax.random.PRNGKey(0),
            )
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        assert np.isfinite(float(loss))
        for t in range(3):
            assert np.isfinite(float(aux[f"loss_s{t}_cls"])), t
            assert np.isfinite(float(aux[f"loss_s{t}_reg"])), t
            g = jax.tree_util.tree_reduce(
                lambda a, g: a + jnp.abs(g).sum(), grads[f"bbox_head{t}"], 0.0
            )
            assert float(g) > 0, f"no grad reached bbox_head{t}"
        g_rpn = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.abs(g).sum(), grads["rpn"], 0.0
        )
        assert float(g_rpn) > 0
        assert float(aux["num_pos_rois"]) > 0

    def test_stage_weights_scale_total(self, cascade_setup, rng):
        model, cfg, variables = cascade_setup
        batch = _batch(rng)
        losses = cascade_rcnn_loss(
            cfg, model, variables, batch, jax.random.PRNGKey(0)
        )
        want = losses["loss_rpn_cls"] + losses["loss_rpn_reg"]
        for t, w in enumerate(cfg.stage_loss_weights):
            want = want + w * (losses[f"loss_s{t}_cls"] + losses[f"loss_s{t}_reg"])
        np.testing.assert_allclose(float(losses["loss"]), float(want), rtol=1e-6)


class TestCascadeInference:
    def test_inference_shapes_and_labels(self, cascade_setup, rng):
        model, cfg, variables = cascade_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        dets = cascade_rcnn_inference(
            cfg, model, variables, x,
            img_shapes=jnp.array([[64, 64], [64, 64]], jnp.float32),
            scale_factors=jnp.array([1.0, 2.0]),
        )
        assert dets.boxes.shape == (2, 8, 4)
        assert dets.labels.shape == (2, 8)
        lab = np.asarray(dets.labels)
        v = np.asarray(dets.valid)
        assert ((lab[v] >= 0) & (lab[v] < 3)).all()

    def test_inference_jits(self, cascade_setup, rng):
        model, cfg, variables = cascade_setup

        @jax.jit
        def run(variables, x):
            return cascade_rcnn_inference(cfg, model, variables, x)

        dets = run(variables, jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32))
        assert dets.boxes.shape == (1, 8, 4)

    def test_single_stage_matches_frcnn_decode_protocol(self, cascade_setup, rng):
        # with num_stages=1 the cascade decode degenerates to the Faster
        # R-CNN protocol: one head, one decode, NMS on its scores
        model, cfg, variables = cascade_setup
        cfg1 = CascadeRCNNConfig(
            num_classes=cfg.num_classes,
            anchor_generator=cfg.anchor_generator,
            proposal_test=cfg.proposal_test,
            max_detections=8,
            num_stages=1,
            stage_pos_ious=(0.5,),
            stage_target_stds=((0.1, 0.1, 0.2, 0.2),),
            stage_loss_weights=(1.0,),
        )
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        dets = cascade_rcnn_inference(cfg1, model, variables, x)
        assert dets.boxes.shape == (1, 8, 4)


class TestCascadeBuilder:
    def test_build_from_config_dicts(self):
        from torch_detection_tpu.builder import build_detection_cfg, build_detector

        det_cfg = build_detection_cfg(dict(
            style="cascade_rcnn",
            num_classes=3,
            num_stages=3,
            stage_pos_ious=[0.5, 0.6, 0.7],
            stage_loss_weights=[1.0, 0.5, 0.25],
            stage_target_stds=[[0.1, 0.1, 0.2, 0.2],
                               [0.05, 0.05, 0.1, 0.1],
                               [0.033, 0.033, 0.067, 0.067]],
            anchor=dict(strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
                        scales=(8.0,)),
            max_detections=8,
        ))
        assert isinstance(det_cfg, CascadeRCNNConfig)
        assert det_cfg.stage_pos_ious == (0.5, 0.6, 0.7)
        assert det_cfg.stage_target_stds[2] == (0.033, 0.033, 0.067, 0.067)

        model = build_detector(dict(
            type="CascadeRCNN",
            num_stages=3,
            backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
            neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
            rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
            bbox_head=dict(type="BBoxHead", num_classes=3, fc_channels=32),
        ))
        assert isinstance(model, CascadeRCNN)

    def test_validate_dispatch(self, cascade_setup):
        from torch_detection_tpu.engine.validate import make_inference_fn

        model, cfg, _ = cascade_setup
        infer = make_inference_fn(model, cfg)
        assert infer is not None
