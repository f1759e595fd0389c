"""SSD detector config, loss (OHEM), and fixed-shape decode.

Completes the SSD family over ``SSDVGG`` + ``SSDHead`` (reference context:
TCGGroup/Torch_Detection ships the VGG backbone, ``models/backbone/vgg.py``,
but no detector tier — SURVEY.md §2 #33).  TPU-first details:

  * hard-negative mining (the SSD staple) is fixed-shape: negatives are
    RANKED by their cls loss with a scatter-computed rank vector and kept
    through a ``rank < 3 * num_pos`` mask — no dynamic shapes, one program;
  * classification is softmax CE over C+1 (background 0), matching the
    dataset's 1-based label contract directly;
  * decode shares ``multiclass_nms`` (class-offset trick, fixpoint greedy)
    with the other families, incl. the ``approx_top_k`` option.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.anchors import SSDAnchorGenerator
from ...ops.assign import MaxIoUAssigner
from ...ops.boxes import bbox2delta, delta2bbox
from ...ops.losses import smooth_l1_loss
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    num_classes: int = 80
    anchor_generator: SSDAnchorGenerator = SSDAnchorGenerator()
    target_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    assigner: MaxIoUAssigner = MaxIoUAssigner(
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0
    )
    neg_pos_ratio: float = 3.0
    smooth_l1_beta: float = 1.0
    # inference (mmdet ssd300 test defaults)
    score_thr: float = 0.02
    nms_iou_thr: float = 0.45
    pre_nms_top_k: int = 1000
    max_detections: int = 200
    approx_top_k: bool = False


def _flatten_ssd_outputs(
    cfg: SSDConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Per-level (B, H, W, A*(C+1)) -> (B, N, C+1), (B, N, 4)."""
    b = cls_scores[0].shape[0]
    c1 = cfg.num_classes + 1
    flat_c = jnp.concatenate(
        [s.reshape(b, -1, c1).astype(jnp.float32) for s in cls_scores], axis=1
    )
    flat_r = jnp.concatenate(
        [r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds], axis=1
    )
    return flat_c, flat_r


def ssd_loss(
    cfg: SSDConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G) int32, 1-based (0 = background)
    gt_valid: jax.Array,  # (B, G) bool
) -> Dict[str, jax.Array]:
    """Softmax CE with 3:1 hard-negative mining + smooth-L1, per mmdet SSD."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)  # (N, 4)
    flat_c, flat_r = _flatten_ssd_outputs(cfg, cls_scores, bbox_preds)
    n = anchors.shape[0]

    def one_image(i):
        assign = cfg.assigner(anchors, gt_boxes[i], gt_valid[i], gt_labels[i])
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        cls_t = jnp.where(pos, assign.labels, 0)  # 1-based fg, 0 = bg

        logp = jax.nn.log_softmax(flat_c[i], axis=-1)
        ce = -jnp.take_along_axis(logp, cls_t[:, None], axis=-1)[:, 0]  # (N,)

        num_pos = jnp.sum(pos)
        # fixed-shape OHEM: rank negatives by loss, keep rank < ratio*num_pos
        neg_score = jnp.where(neg, ce, -jnp.inf)
        order = jnp.argsort(-neg_score)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        keep_neg = neg & (rank < (cfg.neg_pos_ratio * num_pos).astype(jnp.int32))

        denom = jnp.maximum(num_pos.astype(jnp.float32), 1.0)
        cls_loss = jnp.sum(ce * (pos | keep_neg)) / denom

        safe_gt = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_boxes.shape[1] - 1)
        targets = bbox2delta(
            anchors, gather_rows(gt_boxes[i], safe_gt), cfg.target_means,
            cfg.target_stds,
        )
        reg_loss = smooth_l1_loss(
            flat_r[i], targets, weight=pos[:, None].astype(jnp.float32),
            beta=cfg.smooth_l1_beta, avg_factor=denom,
        )
        return cls_loss, reg_loss, num_pos

    cls_l, reg_l, num_pos = jax.vmap(one_image)(jnp.arange(gt_boxes.shape[0]))
    loss_cls = jnp.mean(cls_l)
    loss_reg = jnp.mean(reg_l)
    return {
        "loss_cls": loss_cls,
        "loss_reg": loss_reg,
        "loss": loss_cls + loss_reg,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def decode_ssd(
    cfg: SSDConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,  # (B, 2)
    scale_factors: Optional[jax.Array] = None,  # (B,)
) -> NMSResult:
    """softmax -> delta decode -> class-wise NMS, (B, max_detections) padded."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)
    flat_c, flat_r = _flatten_ssd_outputs(cfg, cls_scores, bbox_preds)
    probs = jax.nn.softmax(flat_c, axis=-1)[..., 1:]  # (B, N, C) drop bg

    def one_image(i):
        boxes = delta2bbox(anchors, flat_r[i], cfg.target_means, cfg.target_stds)
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            x = jnp.clip(boxes[:, 0::2], 0, w - 1.0)
            y = jnp.clip(boxes[:, 1::2], 0, h - 1.0)
            boxes = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        res = multiclass_nms(
            boxes, probs[i],
            iou_thr=cfg.nms_iou_thr, score_thr=cfg.score_thr,
            pre_nms_top_k=cfg.pre_nms_top_k, max_out=cfg.max_detections,
            approx_top_k=cfg.approx_top_k,
        )
        out_boxes = res.boxes
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[i]
        return NMSResult(out_boxes, res.scores, res.labels, res.valid, res.indices)

    return jax.vmap(one_image)(jnp.arange(flat_c.shape[0]))
