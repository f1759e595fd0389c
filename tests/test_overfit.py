"""Learning validation: a tiny detector must overfit one synthetic image —
loss drops sharply and the decoded detection localizes the gt box.

This is the end-to-end correctness signal the unit tests can't give:
targets/assigner/loss/optimizer/decode all have to agree on conventions for
this to pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from torch_detection_tpu.models.detectors import (
    RetinaNetConfig,
    SingleStageDetector,
    decode_detections,
    retina_loss,
)
from torch_detection_tpu.ops.anchors import AnchorGenerator
from torch_detection_tpu.parallel import create_train_state, make_train_step


@pytest.mark.slow
def test_overfit_single_image():
    model = SingleStageDetector(
        backbone=dict(type="ResNet", depth=18, num_stages=3, out_indices=(0, 1, 2)),
        neck=dict(type="FPN", in_channels=(64, 128, 256), out_channels=32, num_outs=3),
        head=dict(type="RetinaHead", num_classes=2, in_channels=32, feat_channels=32,
                  stacked_convs=1, num_base_anchors=9),
    )
    cfg = RetinaNetConfig(
        num_classes=2,
        anchor_generator=AnchorGenerator(strides=(4, 8, 16)),
        score_thr=0.05,
        max_detections=5,
        pre_nms_top_k=100,
    )

    # one 64x64 image with a bright 24x24 square at (16..39)
    rng = np.random.default_rng(0)
    img = rng.normal(0, 0.1, (1, 64, 64, 3)).astype(np.float32)
    img[0, 16:40, 16:40, :] += 2.0
    x = jnp.asarray(img)
    gt_boxes = jnp.array([[[16.0, 16.0, 39.0, 39.0]]])
    gt_labels = jnp.array([[1]], jnp.int32)
    gt_valid = jnp.array([[True]])

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply({"params": params, "batch_stats": batch_stats}, batch["image"], train=True)
        losses = retina_loss(cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
        return losses["loss"], {"num_pos": losses["num_pos"]}

    tx = optax.adam(1e-3)
    state = create_train_state(variables["params"], tx, batch_stats=variables["batch_stats"])
    step = make_train_step(loss_fn, tx, donate_state=False)
    batch = {"image": x, "gt_boxes": gt_boxes, "gt_labels": gt_labels, "gt_valid": gt_valid}

    first_loss = None
    for i in range(120):
        state, metrics = step(state, batch)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    assert final_loss < 0.25 * first_loss, (first_loss, final_loss)

    cls, reg = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, x
    )
    dets = decode_detections(cfg, cls, reg)
    v = np.asarray(dets.valid[0])
    assert v.any(), "no detections after overfitting"
    best = int(np.argmax(np.asarray(dets.scores[0])))
    box = np.asarray(dets.boxes[0][best])
    assert np.asarray(dets.labels[0])[best] == 0  # class 1 -> 0-based 0
    # IoU of the top detection with the gt must be high
    gt = np.array([16.0, 16.0, 39.0, 39.0])
    x1, y1 = np.maximum(box[:2], gt[:2])
    x2, y2 = np.minimum(box[2:], gt[2:])
    inter = max(x2 - x1 + 1, 0) * max(y2 - y1 + 1, 0)
    a1 = (box[2] - box[0] + 1) * (box[3] - box[1] + 1)
    a2 = 24.0 * 24.0
    iou = inter / (a1 + a2 - inter)
    assert iou > 0.5, (box, iou)
