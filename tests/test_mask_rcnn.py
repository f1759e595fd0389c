"""Mask R-CNN end-to-end: loss with mask branch, inference with mask probs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_detection_tpu.models.detectors import (
    MaskRCNN,
    MaskRCNNConfig,
    mask_rcnn_inference,
    mask_rcnn_loss,
)
from torch_detection_tpu.models.heads import ProposalConfig, paste_masks
from torch_detection_tpu.ops.anchors import AnchorGenerator


@pytest.fixture(scope="module")
def mrcnn_setup():
    model = MaskRCNN(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=3, fc_channels=32),
        mask_head=dict(type="FCNMaskHead", num_classes=3, in_channels=16, conv_channels=16, num_convs=1),
    )
    cfg = MaskRCNNConfig(
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
        mask_roi_size=7,
        mask_size=14,
    )
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(0), x)
    vars_roi = model.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 8, 7, 7, 16)), method=MaskRCNN.roi_forward
    )
    vars_mask = model.init(
        jax.random.PRNGKey(2), jnp.zeros((2, 8, 7, 7, 16)), method=MaskRCNN.mask_forward
    )
    merged = {
        "params": {**variables["params"], **vars_roi["params"], **vars_mask["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }
    return model, cfg, merged


def _batch(rng):
    masks = np.zeros((2, 2, 64, 64), np.uint8)
    masks[0, 0, 4:30, 4:30] = 1
    masks[1, 0, 10:60, 10:50] = 1
    masks[1, 1, 2:18, 2:20] = 1
    return {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32),
        "gt_boxes": jnp.array(
            [[[4.0, 4.0, 29.0, 29.0], [0, 0, 0, 0]],
             [[10.0, 10.0, 49.0, 59.0], [2.0, 2.0, 19.0, 17.0]]]
        ),
        "gt_labels": jnp.array([[1, 0], [2, 3]], jnp.int32),
        "gt_valid": jnp.array([[True, False], [True, True]]),
        "gt_masks": jnp.asarray(masks),
        "img_shape": jnp.array([[64, 64], [64, 64]], jnp.float32),
    }


class TestMaskRCNN:
    def test_loss_includes_mask_and_grads_flow(self, mrcnn_setup, rng):
        model, cfg, variables = mrcnn_setup
        batch = _batch(rng)

        def loss_fn(params):
            losses = mask_rcnn_loss(
                cfg, model, {"params": params, "batch_stats": variables["batch_stats"]},
                batch, jax.random.PRNGKey(0),
            )
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
        assert np.isfinite(float(loss))
        assert np.isfinite(float(aux["loss_mask"]))
        g_mask = jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.abs(g).sum(), grads["mask_head"], 0.0
        )
        assert float(g_mask) > 0

    def test_inference_masks(self, mrcnn_setup, rng):
        model, cfg, variables = mrcnn_setup
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        out = mask_rcnn_inference(
            cfg, model, variables, x,
            img_shapes=jnp.array([[64, 64], [64, 64]], jnp.float32),
        )
        assert out.mask_probs.shape == (2, 8, 14, 14)
        assert out.boxes.shape == (2, 8, 4)
        p = np.asarray(out.mask_probs)
        assert (p >= 0).all() and (p <= 1).all()
        # invalid slots carry zero masks
        v = np.asarray(out.valid)
        assert (p[~v] == 0).all()

    def test_paste_pipeline(self, mrcnn_setup, rng):
        model, cfg, variables = mrcnn_setup
        x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
        out = mask_rcnn_inference(cfg, model, variables, x)
        pasted = paste_masks(out.mask_probs[0], out.boxes[0], (64, 64))
        assert pasted.shape == (8, 64, 64)
