"""Fast R-CNN: precomputed-proposal detection (no RPN).

Closes the reference's ``proposal_file`` workflow end-to-end: its data tier
ships proposals through every geometric transform
(``/root/reference/datasets/base_dataset.py:100-105,193-200,289-306``) for a
proposal-based detector the reference never implemented (empty ``models/``).
Here the consumer exists: proposals come in on the batch as a fixed-shape
``(B, P, 4|5)`` slate + validity mask (data/collate.py pads them), the RoI
stage samples/aligns/classifies exactly like Faster R-CNN's second stage,
and ``tools/dump_proposals.py`` produces the proposal pkl from a trained RPN
in the reference's format (per-image ``(n, 5)`` xyxy+score arrays, original
image coordinates, dataset order).

TPU shape discipline matches the rest of the framework: the proposal slate
is static-``P``, RoI sampling selects a constant ``rcnn_num_samples`` per
image, and the whole train step jits into one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.assign import MaxIoUAssigner
from ...ops.boxes import bbox2delta, delta2bbox
from ...ops.losses import smooth_l1_loss, softmax_cross_entropy
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.roi_align import batched_multilevel_roi_align
from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS
from .two_stage import _sample_fixed


@DETECTORS.register_module
class FastRCNN(nn.Module):
    """backbone + neck + RoI box head; proposals arrive from the data tier."""

    backbone: Dict[str, Any]
    neck: Dict[str, Any]
    bbox_head: Dict[str, Any]

    def setup(self):
        self.backbone_mod = BACKBONES.build(dict(self.backbone), name="backbone")
        self.neck_mod = NECKS.build(dict(self.neck), name="neck")
        self.bbox_mod = HEADS.build(dict(self.bbox_head), name="bbox_head")

    def __call__(self, images: jax.Array, train: bool = False):
        """Backbone + neck forward -> pyramid features."""
        return self.neck_mod(self.backbone_mod(images, train=train), train=train)

    def roi_forward(self, roi_feats: jax.Array, train: bool = False):
        return self.bbox_mod(roi_feats, train=train)


@dataclasses.dataclass(frozen=True)
class FastRCNNConfig:
    """Static config for the proposal-based RoI stage (no RPN tier)."""

    num_classes: int = 80
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)  # P2..P5 carry rois
    roi_size: int = 7
    finest_scale: float = 56.0
    # train
    rcnn_assigner: MaxIoUAssigner = MaxIoUAssigner(
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5
    )
    rcnn_num_samples: int = 512
    rcnn_pos_fraction: float = 0.25
    rcnn_target_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    rcnn_target_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    smooth_l1_beta: float = 1.0
    # inference
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_detections: int = 100
    approx_top_k: bool = False


def fast_rcnn_loss(
    cfg: FastRCNNConfig,
    model: FastRCNN,
    variables: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    train: bool = True,
) -> Dict[str, jax.Array]:
    """RoI-stage loss on the batch's precomputed proposal slate.

    ``batch['proposals']`` is ``(B, P, 4)`` or ``(B, P, 5)`` (score column
    ignored for sampling — the reference's files carry it) with
    ``batch['proposal_valid']`` ``(B, P)``; both already live in the
    transformed canvas frame (the dataset resized/flipped them alongside the
    image, reference base_dataset.py:193-200 semantics).
    """
    images = batch["image"]
    gt_boxes = batch["gt_boxes"]  # (B, G, 4)
    gt_labels = batch["gt_labels"]  # (B, G)
    gt_valid = batch["gt_valid"]  # (B, G)
    proposals = batch["proposals"][..., :4]
    prop_valid = batch["proposal_valid"]
    b = images.shape[0]

    feats = model.apply(variables, images, train=train)
    rngs = jax.random.split(rng, b)
    # the candidate slate (P proposals + G gts) is static; small proposal
    # files may undershoot the configured roi budget
    num_samples = min(cfg.rcnn_num_samples, proposals.shape[1] + gt_boxes.shape[1])

    def sample_rois(i):
        # candidates = proposals + gt (gt guarantees positives early on)
        cand = jnp.concatenate([proposals[i], gt_boxes[i]], axis=0)
        cand_valid = jnp.concatenate([prop_valid[i], gt_valid[i]], axis=0)
        assign = cfg.rcnn_assigner(
            cand, gt_boxes[i], gt_valid[i], gt_labels[i], anchor_valid=cand_valid
        )
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        idx, is_pos, is_valid = _sample_fixed(
            rngs[i], pos, neg, num_samples, cfg.rcnn_pos_fraction
        )
        rois = cand[idx]
        labels = jnp.where(is_pos, assign.labels[idx], 0)  # 0 = background
        safe_gt = jnp.clip(assign.assigned_gt_inds[idx] - 1, 0, gt_boxes.shape[1] - 1)
        matched = gt_boxes[i][safe_gt]
        reg_t = bbox2delta(rois, matched, cfg.rcnn_target_means, cfg.rcnn_target_stds)
        return rois, labels, reg_t, is_pos, is_valid

    rois, roi_labels, roi_reg_t, roi_pos, roi_valid = jax.vmap(sample_rois)(
        jnp.arange(b)
    )

    roi_feats = batched_multilevel_roi_align(
        list(feats[: len(cfg.roi_strides)]),
        rois, cfg.roi_strides, cfg.roi_size, finest_scale=cfg.finest_scale,
    )
    cls_logits, reg_pred = model.apply(
        variables, roi_feats, train=train, method=FastRCNN.roi_forward
    )
    cls_logits = cls_logits.astype(jnp.float32)
    reg_pred = reg_pred.astype(jnp.float32)

    w_valid = roi_valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(w_valid), 1.0)
    cls_l = softmax_cross_entropy(cls_logits, roi_labels, weight=w_valid, avg_factor=n_valid)
    n_pos = jnp.maximum(jnp.sum(roi_pos), 1.0)
    if reg_pred.shape[-1] == 4:
        reg_for_label = reg_pred
    else:
        safe_lbl = jnp.clip(roi_labels - 1, 0, cfg.num_classes - 1)
        reg_for_label = jnp.take_along_axis(
            reg_pred.reshape(*reg_pred.shape[:-1], cfg.num_classes, 4),
            safe_lbl[..., None, None], axis=-2,
        )[..., 0, :]
    reg_l = smooth_l1_loss(
        reg_for_label, roi_reg_t, weight=roi_pos.astype(jnp.float32)[..., None],
        beta=cfg.smooth_l1_beta, avg_factor=n_pos,
    )

    return {
        "loss": cls_l + reg_l,
        "loss_rcnn_cls": cls_l,
        "loss_rcnn_reg": reg_l,
        "num_pos_rois": jnp.sum(roi_pos.astype(jnp.float32)),
    }


def fast_rcnn_inference(
    cfg: FastRCNNConfig,
    model: FastRCNN,
    variables: Dict,
    images: jax.Array,
    proposals: jax.Array,  # (B, P, 4|5) canvas frame
    proposal_valid: jax.Array,  # (B, P) bool
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Proposals -> RoIAlign -> box head -> per-class decode + NMS, padded."""
    feats = model.apply(variables, images)
    rois = proposals[..., :4].astype(jnp.float32)
    roi_feats = batched_multilevel_roi_align(
        list(feats[: len(cfg.roi_strides)]),
        rois, cfg.roi_strides, cfg.roi_size, finest_scale=cfg.finest_scale,
    )
    cls_logits, reg_pred = model.apply(
        variables, roi_feats, method=FastRCNN.roi_forward
    )
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[..., 1:]  # drop bg
    reg_pred = reg_pred.astype(jnp.float32)

    def one_image(i):
        boxes = delta2bbox(
            rois[i], reg_pred[i], cfg.rcnn_target_means, cfg.rcnn_target_stds
        )
        if boxes.shape[-1] != 4:  # class-specific -> (R, C, 4)
            boxes = boxes.reshape(boxes.shape[0], -1, 4)
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            x = jnp.clip(boxes[..., 0::2], 0, w - 1.0)
            y = jnp.clip(boxes[..., 1::2], 0, h - 1.0)
            boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
        scores = jnp.where(proposal_valid[i][:, None], probs[i], 0.0)
        res = multiclass_nms(
            boxes, scores,
            iou_thr=cfg.nms_iou_thr, score_thr=cfg.score_thr,
            pre_nms_top_k=min(1000, scores.size), max_out=cfg.max_detections,
            approx_top_k=cfg.approx_top_k,
        )
        out_boxes = res.boxes
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[i]
        return NMSResult(out_boxes, res.scores, res.labels, res.valid, res.indices)

    return jax.vmap(one_image)(jnp.arange(images.shape[0]))
