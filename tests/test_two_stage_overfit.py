"""Two-stage learning validation: Faster R-CNN overfits one synthetic image."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_detection_tpu.models.detectors import (
    FasterRCNNConfig,
    TwoStageDetector,
    faster_rcnn_inference,
    faster_rcnn_loss,
)
from torch_detection_tpu.models.heads import ProposalConfig
from torch_detection_tpu.ops.anchors import AnchorGenerator


@pytest.mark.slow
def test_faster_rcnn_overfit():
    model = TwoStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=4, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=(64, 128, 256, 512), out_channels=16, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=16, feat_channels=16, num_base_anchors=3),
        bbox_head=dict(type="BBoxHead", num_classes=2, fc_channels=64),
    )
    cfg = FasterRCNNConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(
            strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
            scales=(8.0,), octave_base_scale=None,
        ),
        proposal_train=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        proposal_test=ProposalConfig(pre_nms_per_level=128, post_nms_top_k=64),
        rpn_num_samples=64,
        rcnn_num_samples=32,
        max_detections=5,
        score_thr=0.05,
    )

    rng = np.random.default_rng(0)
    img = rng.normal(0, 0.1, (1, 64, 64, 3)).astype(np.float32)
    img[0, 16:44, 20:48, :] += 2.0
    batch = {
        "image": jnp.asarray(img),
        "gt_boxes": jnp.array([[[20.0, 16.0, 47.0, 43.0]]]),
        "gt_labels": jnp.array([[1]], jnp.int32),
        "gt_valid": jnp.array([[True]]),
        "img_shape": jnp.array([[64.0, 64.0]]),
    }

    x = batch["image"]
    variables = jax.jit(lambda k, x: model.init(k, x))(jax.random.PRNGKey(0), x)
    vars2 = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 16)), method=TwoStageDetector.roi_forward
    )
    variables = {
        "params": {**variables["params"], **vars2["params"]},
        "batch_stats": variables.get("batch_stats", {}),
    }

    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            losses = faster_rcnn_loss(
                cfg, model, {"params": p, "batch_stats": variables["batch_stats"]},
                batch, key,
            )
            return losses["loss"], losses

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, aux

    params = variables["params"]
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(80):
        key, sub = jax.random.split(key)
        params, opt_state, loss, aux = step(params, opt_state, sub)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert np.isfinite(final)
    assert final < 0.5 * first, (first, final)

    dets = faster_rcnn_inference(
        cfg, model, {"params": params, "batch_stats": variables["batch_stats"]},
        x, img_shapes=batch["img_shape"],
    )
    v = np.asarray(dets.valid[0])
    assert v.any(), "no detections after overfitting"
    best = int(np.argmax(np.asarray(dets.scores[0])))
    box = np.asarray(dets.boxes[0][best])
    gt = np.array([20.0, 16.0, 47.0, 43.0])
    x1, y1 = np.maximum(box[:2], gt[:2])
    x2, y2 = np.minimum(box[2:], gt[2:])
    inter = max(x2 - x1 + 1, 0) * max(y2 - y1 + 1, 0)
    a1 = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    a2 = 28.0 * 28.0
    iou = inter / (a1 + a2 - inter)
    assert iou > 0.3, (box, iou)
