"""Two-stage detector (Faster R-CNN): RPN proposals -> RoIAlign -> box head.

Completes the two-stage path the reference only left hooks for (proposal
plumbing in ``datasets/base_dataset.py:100-105,193-200``; empty model tier).
Everything is fixed-shape: the proposal slate is (B, P) padded+masked, RoI
sampling selects a constant ``num_samples`` rois per image via top-k over
sampling priorities, and both stage losses are mask-weighted sums — the full
train step jits into one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.anchors import AnchorGenerator
from ...ops.assign import MaxIoUAssigner
from ...ops.boxes import bbox2delta, delta2bbox
from ...ops.losses import (
    binary_cross_entropy,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.roi_align import batched_multilevel_roi_align
from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS
from ..heads.rpn_head import ProposalConfig, Proposals, generate_proposals


@DETECTORS.register_module
class TwoStageDetector(nn.Module):
    """backbone + neck + RPN head + RoI box head."""

    backbone: Dict[str, Any]
    neck: Dict[str, Any]
    rpn_head: Dict[str, Any]
    bbox_head: Dict[str, Any]

    def setup(self):
        self.backbone_mod = BACKBONES.build(dict(self.backbone), name="backbone")
        self.neck_mod = NECKS.build(dict(self.neck), name="neck")
        self.rpn_mod = HEADS.build(dict(self.rpn_head), name="rpn")
        self.bbox_mod = HEADS.build(dict(self.bbox_head), name="bbox_head")

    def __call__(self, images: jax.Array, train: bool = False):
        """Backbone+neck+RPN forward: (feats, rpn_scores, rpn_deltas)."""
        feats = self.neck_mod(self.backbone_mod(images, train=train), train=train)
        rpn_scores, rpn_deltas = self.rpn_mod(feats, train=train)
        return feats, rpn_scores, rpn_deltas

    def roi_forward(self, roi_feats: jax.Array, train: bool = False):
        """Second stage on aligned roi features."""
        return self.bbox_mod(roi_feats, train=train)


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int = 80
    anchor_generator: AnchorGenerator = AnchorGenerator(
        strides=(4, 8, 16, 32, 64), ratios=(0.5, 1.0, 2.0),
        scales=(8.0,), octave_base_scale=None,
    )
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)  # P2..P5 carry rois
    roi_size: int = 7
    finest_scale: float = 56.0
    # rpn train
    rpn_assigner: MaxIoUAssigner = MaxIoUAssigner(
        pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3
    )
    rpn_num_samples: int = 256
    rpn_pos_fraction: float = 0.5
    rpn_target_stds: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    proposal_train: ProposalConfig = ProposalConfig(
        pre_nms_per_level=2000, post_nms_top_k=1000, nms_iou_thr=0.7
    )
    proposal_test: ProposalConfig = ProposalConfig(
        pre_nms_per_level=1000, post_nms_top_k=1000, nms_iou_thr=0.7
    )
    # rcnn train
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
    # approx_max_k for the final NMS candidate pool (see ops/nms.py); the
    # RPN's own approx flag lives on proposal_train/proposal_test
    approx_top_k: bool = False


def _sample_fixed(
    rng: jax.Array,
    pos_mask: jax.Array,  # (N,)
    neg_mask: jax.Array,
    num: int,
    pos_fraction: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-shape random sampling -> (indices (num,), is_pos, is_valid).

    Priority trick: positives get priority 2+u, negatives 1+u, rest u<1;
    top-k picks at most ``num`` with positives first up to the pos quota.
    """
    n = pos_mask.shape[0]
    k_pos, k_all = jax.random.split(rng)
    u = jax.random.uniform(k_all, (n,), minval=0.0, maxval=0.5)
    num_pos_wanted = int(num * pos_fraction)
    # cap positives at the quota: keep the num_pos_wanted highest-scored.
    # top_k of the quota + a threshold compare selects the same set as a
    # full argsort-rank (uniform scores never tie in practice) at a
    # fraction of the cost — the argsort over all N anchors was ~7 ms of
    # the b4 FRCNN train fwd (r3).  When fewer than the quota are positive
    # the k-th score is the -1.0 fill, and the max() keeps all positives.
    pos_rank_scores = jnp.where(pos_mask, jax.random.uniform(k_pos, (n,)), -1.0)
    kth = jax.lax.top_k(pos_rank_scores, num_pos_wanted)[0][-1]
    pos_sel = pos_mask & (pos_rank_scores >= jnp.maximum(kth, 0.0))

    priority = jnp.where(pos_sel, 2.0 + u, jnp.where(neg_mask, 1.0 + u, u))
    top_p, idx = jax.lax.top_k(priority, num)
    return idx, top_p >= 2.0, top_p >= 1.0


def rpn_losses(
    cfg: FasterRCNNConfig,
    anchors: jax.Array,  # (N, 4)
    flat_rpn_s: jax.Array,  # (B, N) f32
    flat_rpn_d: jax.Array,  # (B, N, 4) f32
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_valid: jax.Array,
    rngs: jax.Array,  # (B, key)
) -> Tuple[jax.Array, jax.Array]:
    """Per-image RPN cls/reg losses on a fixed sampled slate -> ((B,), (B,)).

    Shared by Faster/Mask R-CNN and Cascade R-CNN (whose RPN tier is
    identical; only the RoI stages differ)."""

    def rpn_one(i):
        assign = cfg.rpn_assigner(anchors, gt_boxes[i], gt_valid[i], gt_labels[i])
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        idx, is_pos, is_valid = _sample_fixed(
            rngs[i], pos, neg, cfg.rpn_num_samples, cfg.rpn_pos_fraction
        )
        s = flat_rpn_s[i][idx]
        d = flat_rpn_d[i][idx]
        safe_gt = jnp.clip(assign.assigned_gt_inds[idx] - 1, 0, gt_boxes.shape[1] - 1)
        matched = gt_boxes[i][safe_gt]
        targets = bbox2delta(anchors[idx], matched, stds=cfg.rpn_target_stds)
        w = is_valid.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(w), 1.0)
        cls_loss = binary_cross_entropy(s, is_pos.astype(jnp.float32), weight=w, avg_factor=n_valid)
        reg_loss = smooth_l1_loss(
            d, targets, weight=is_pos.astype(jnp.float32)[:, None],
            beta=1.0 / 9.0, avg_factor=n_valid,
        )
        return cls_loss, reg_loss

    return jax.vmap(rpn_one)(jnp.arange(gt_boxes.shape[0]))


def flatten_rpn_outputs(
    rpn_scores: Sequence[jax.Array], rpn_deltas: Sequence[jax.Array]
) -> Tuple[jax.Array, jax.Array]:
    """Per-level (B,H,W,A)/(B,H,W,A*4) -> flat f32 (B, N) / (B, N, 4)."""
    b = rpn_scores[0].shape[0]
    flat_s = jnp.concatenate(
        [s.reshape(b, -1).astype(jnp.float32) for s in rpn_scores], axis=1
    )
    flat_d = jnp.concatenate(
        [d.reshape(b, -1, 4).astype(jnp.float32) for d in rpn_deltas], axis=1
    )
    return flat_s, flat_d


def faster_rcnn_loss(
    cfg: FasterRCNNConfig,
    model: TwoStageDetector,
    variables: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    train: bool = True,
) -> Dict[str, jax.Array]:
    """Both stage losses in one pure function (jit the caller)."""
    losses, _, _ = _faster_rcnn_loss_core(cfg, model, variables, batch, rng, train)
    return losses


def _faster_rcnn_loss_core(
    cfg: FasterRCNNConfig,
    model: TwoStageDetector,
    variables: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    train: bool = True,
):
    """Loss body that also returns ``(feats, proposals)`` so extensions (the
    mask branch) can reuse the SAME traced forward.  Re-applying the model in
    the extension is numerically identical (XLA CSEs the duplicate forward)
    but JAX then builds a second, independent backbone+FPN *backward* for the
    extension's cotangents — measured +26 ms of the b4 Mask R-CNN train step
    (isolated mask-RoIAlign f+b is 5.3 ms; the cumulative probe charged it
    31.6).  One traced forward means one backward with summed cotangents."""
    images = batch["image"]
    gt_boxes = batch["gt_boxes"]  # (B, G, 4)
    gt_labels = batch["gt_labels"]  # (B, G)
    gt_valid = batch["gt_valid"]  # (B, G)
    img_shapes = batch.get("img_shape")
    b = images.shape[0]

    feats, rpn_scores, rpn_deltas = model.apply(variables, images, train=train)
    featmap_sizes = [tuple(s.shape[1:3]) for s in rpn_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)  # (N, 4)
    flat_rpn_s, flat_rpn_d = flatten_rpn_outputs(rpn_scores, rpn_deltas)

    rngs = jax.random.split(rng, b * 2).reshape(b, 2, -1)

    rpn_cls_l, rpn_reg_l = rpn_losses(
        cfg, anchors, flat_rpn_s, flat_rpn_d, gt_boxes, gt_labels, gt_valid,
        rngs[:, 0],
    )

    # ---------------- stage 2
    proposals = generate_proposals(
        cfg.proposal_train,
        cfg.anchor_generator,
        [jax.lax.stop_gradient(s) for s in rpn_scores],
        [jax.lax.stop_gradient(d) for d in rpn_deltas],
        img_shapes=img_shapes,
    )

    def sample_rois(i):
        # candidates = proposals + gt (gt guarantees positives early on)
        cand = jnp.concatenate([proposals.boxes[i], gt_boxes[i]], axis=0)
        cand_valid = jnp.concatenate([proposals.valid[i], gt_valid[i]], axis=0)
        assign = cfg.rcnn_assigner(
            cand, gt_boxes[i], gt_valid[i], gt_labels[i], anchor_valid=cand_valid
        )
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        idx, is_pos, is_valid = _sample_fixed(
            rngs[i, 1], pos, neg, cfg.rcnn_num_samples, cfg.rcnn_pos_fraction
        )
        rois = cand[idx]
        labels = jnp.where(is_pos, assign.labels[idx], 0)  # 0 = background
        safe_gt = jnp.clip(assign.assigned_gt_inds[idx] - 1, 0, gt_boxes.shape[1] - 1)
        matched = gt_boxes[i][safe_gt]
        reg_t = bbox2delta(rois, matched, cfg.rcnn_target_means, cfg.rcnn_target_stds)
        return rois, labels, reg_t, is_pos, is_valid

    rois, roi_labels, roi_reg_t, roi_pos, roi_valid = jax.vmap(sample_rois)(jnp.arange(b))

    roi_feats = batched_multilevel_roi_align(
        list(feats[: len(cfg.roi_strides)]),  # native dtype; einsums accumulate f32
        rois, cfg.roi_strides, cfg.roi_size, finest_scale=cfg.finest_scale,
    )
    cls_logits, reg_pred = model.apply(variables, roi_feats, train=train, method=TwoStageDetector.roi_forward)
    cls_logits = cls_logits.astype(jnp.float32)
    reg_pred = reg_pred.astype(jnp.float32)

    w_valid = roi_valid.astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(w_valid), 1.0)
    rcnn_cls_l = softmax_cross_entropy(cls_logits, roi_labels, weight=w_valid, avg_factor=n_valid)
    n_pos = jnp.maximum(jnp.sum(roi_pos), 1.0)
    if reg_pred.shape[-1] == 4:
        reg_for_label = reg_pred
    else:
        safe_lbl = jnp.clip(roi_labels - 1, 0, cfg.num_classes - 1)
        reg_for_label = jnp.take_along_axis(
            reg_pred.reshape(*reg_pred.shape[:-1], cfg.num_classes, 4),
            safe_lbl[..., None, None], axis=-2,
        )[..., 0, :]
    rcnn_reg_l = smooth_l1_loss(
        reg_for_label, roi_reg_t, weight=roi_pos.astype(jnp.float32)[..., None],
        beta=cfg.smooth_l1_beta, avg_factor=n_pos,
    )

    loss_rpn_cls = jnp.mean(rpn_cls_l)
    loss_rpn_reg = jnp.mean(rpn_reg_l)
    total = loss_rpn_cls + loss_rpn_reg + rcnn_cls_l + rcnn_reg_l
    losses = {
        "loss": total,
        "loss_rpn_cls": loss_rpn_cls,
        "loss_rpn_reg": loss_rpn_reg,
        "loss_rcnn_cls": rcnn_cls_l,
        "loss_rcnn_reg": rcnn_reg_l,
        "num_pos_rois": jnp.sum(roi_pos.astype(jnp.float32)),
    }
    return losses, feats, proposals


def faster_rcnn_inference(
    cfg: FasterRCNNConfig,
    model: TwoStageDetector,
    variables: Dict,
    images: jax.Array,
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Proposals -> RoIAlign -> box head -> per-class decode + NMS, padded."""
    feats, rpn_scores, rpn_deltas = model.apply(variables, images)
    proposals = generate_proposals(
        cfg.proposal_test, cfg.anchor_generator, rpn_scores, rpn_deltas, img_shapes
    )
    roi_feats = batched_multilevel_roi_align(
        list(feats[: len(cfg.roi_strides)]),  # native dtype; einsums accumulate f32
        proposals.boxes, cfg.roi_strides, cfg.roi_size, finest_scale=cfg.finest_scale,
    )
    cls_logits, reg_pred = model.apply(
        variables, roi_feats, method=TwoStageDetector.roi_forward
    )
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[..., 1:]  # drop bg
    reg_pred = reg_pred.astype(jnp.float32)

    def one_image(i):
        boxes = delta2bbox(
            proposals.boxes[i], reg_pred[i],
            cfg.rcnn_target_means, cfg.rcnn_target_stds,
        )
        if boxes.shape[-1] != 4:  # class-specific -> (R, C, 4)
            boxes = boxes.reshape(boxes.shape[0], -1, 4)
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            x = jnp.clip(boxes[..., 0::2], 0, w - 1.0)
            y = jnp.clip(boxes[..., 1::2], 0, h - 1.0)
            boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
        scores = jnp.where(proposals.valid[i][:, None], probs[i], 0.0)
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
