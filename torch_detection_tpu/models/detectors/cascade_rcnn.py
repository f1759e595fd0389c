"""Cascade R-CNN: multi-stage box refinement with increasing IoU thresholds.

Cai & Vasconcelos, CVPR 2018.  Extends the two-stage machinery the reference
only left hooks for (proposal plumbing in
``datasets/base_dataset.py:100-105,193-200``; empty model tier) to the
standard three-stage cascade: each RoI stage trains against a higher IoU
threshold (0.5 / 0.6 / 0.7) on the previous stage's *refined* boxes, so the
proposal distribution each head sees matches the quality it is asked to
produce.

TPU design (everything fixed-shape, one jitted program):
* every stage samples a constant ``rcnn_num_samples`` rois via the same
  top-k priority sampler as Faster R-CNN; the refined slate for stage t+1 is
  exactly the stage-t sampled slate (B, R, 4) decoded through the stage-t
  head — no dynamic filtering.  Sampled gt-block candidates are masked out
  of the next slate (mmdet's ``pos_is_gts`` semantics) since the next stage
  re-adds gt boxes itself.
* heads are class-agnostic-regression (the cascade convention): the refine
  step is a single (B, R, 4) delta decode, no per-class selection.
* inference averages the three stages' softmax scores — each evaluated on
  its own progressively-refined roi slate, index-aligned by construction —
  and decodes final boxes from the last stage (the standard formulation).

RPN tier, proposal generation, RoIAlign (Pallas kernel + custom VJP) and
the sampler are shared with ``two_stage.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.assign import MaxIoUAssigner
from ...ops.boxes import bbox2delta, delta2bbox
from ...ops.losses import smooth_l1_loss, softmax_cross_entropy
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.roi_align import batched_multilevel_roi_align
from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS
from ..heads.rpn_head import generate_proposals
from .two_stage import (
    FasterRCNNConfig,
    TwoStageDetector,
    _sample_fixed,
    flatten_rpn_outputs,
    rpn_losses,
)


@DETECTORS.register_module
class CascadeRCNN(TwoStageDetector):
    """backbone + neck + RPN + ``num_stages`` cascade box heads.

    ``bbox_head`` is the per-stage head config; each stage gets its own
    parameters (``bbox_head0..{S-1}``).  Heads must be class-agnostic
    regression (``reg_class_agnostic=True``, the BBoxHead default) so the
    between-stage refine step is a plain 4-delta decode.
    """

    num_stages: int = 3

    def setup(self):
        self.backbone_mod = BACKBONES.build(dict(self.backbone), name="backbone")
        self.neck_mod = NECKS.build(dict(self.neck), name="neck")
        self.rpn_mod = HEADS.build(dict(self.rpn_head), name="rpn")
        head_cfg = dict(self.bbox_head)
        assert head_cfg.get("reg_class_agnostic", True), (
            "CascadeRCNN requires class-agnostic box regression"
        )
        self.bbox_mods = [
            HEADS.build(dict(head_cfg), name=f"bbox_head{t}")
            for t in range(self.num_stages)
        ]

    def roi_forward(self, roi_feats: jax.Array, stage: int, train: bool = False):
        """Stage ``stage``'s head on aligned roi features."""
        return self.bbox_mods[stage](roi_feats, train=train)

    def roi_forward_all(self, roi_feats: jax.Array, train: bool = False):
        """Run every stage head once (parameter initialization helper)."""
        return [
            self.roi_forward(roi_feats, t, train=train)
            for t in range(self.num_stages)
        ]


@dataclasses.dataclass(frozen=True)
class CascadeRCNNConfig(FasterRCNNConfig):
    """Faster R-CNN config + per-stage cascade knobs.

    Stage t's assigner uses ``pos = neg = min_pos = stage_pos_ious[t]``
    (the cascade paper / mmdet convention); ``rcnn_target_stds`` from the
    base config is superseded by ``stage_target_stds``.
    """

    num_stages: int = 3
    stage_pos_ious: Tuple[float, ...] = (0.5, 0.6, 0.7)
    stage_target_stds: Tuple[Tuple[float, float, float, float], ...] = (
        (0.1, 0.1, 0.2, 0.2),
        (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067),
    )
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)

    def stage_assigner(self, t: int) -> MaxIoUAssigner:
        thr = self.stage_pos_ious[t]
        return dataclasses.replace(
            self.rcnn_assigner, pos_iou_thr=thr, neg_iou_thr=thr, min_pos_iou=thr
        )


def _clip_boxes(boxes: jax.Array, img_shapes: Optional[jax.Array]) -> jax.Array:
    """Clip (B, R, 4) xyxy boxes to per-image (h, w) extents."""
    if img_shapes is None:
        return boxes
    h = img_shapes[:, 0][:, None]
    w = img_shapes[:, 1][:, None]
    x1 = jnp.clip(boxes[..., 0], 0, w - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0, h - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0, w - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def cascade_rcnn_loss(
    cfg: CascadeRCNNConfig,
    model: CascadeRCNN,
    variables: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    train: bool = True,
) -> Dict[str, jax.Array]:
    """RPN loss + ``num_stages`` cascaded RoI stage losses, one pure fn."""
    losses, _, _ = _cascade_rcnn_loss_core(cfg, model, variables, batch, rng, train)
    return losses


def _cascade_rcnn_loss_core(
    cfg: CascadeRCNNConfig,
    model: CascadeRCNN,
    variables: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    train: bool = True,
):
    """Cascade loss computation that also returns ``(feats, stage_slates)``.

    Loss extensions (Cascade Mask R-CNN's per-stage mask tier) MUST reuse
    this traced forward and the per-stage sampled slates: re-applying the
    model in an extension is forward-CSE'd by XLA but JAX emits a second
    independent backbone+FPN backward for the extension's cotangents (the
    round-4 Mask R-CNN lesson, ``two_stage._faster_rcnn_loss_core``).

    ``stage_slates[t]`` is a dict of the stage-t sampled slate: ``rois``
    (B, R, 4), ``labels`` (B, R) 1-based, ``is_pos`` (B, R) bool,
    ``matched_gt`` (B, R) int32 clipped gt index.  ``_sample_fixed`` orders
    the slate by descending priority, so positives occupy a prefix block —
    a mask tier can slice ``[:, :mask_num]`` and keep every positive.
    """
    images = batch["image"]
    gt_boxes = batch["gt_boxes"]  # (B, G, 4)
    gt_labels = batch["gt_labels"]  # (B, G)
    gt_valid = batch["gt_valid"]  # (B, G)
    img_shapes = batch.get("img_shape")
    b = images.shape[0]

    feats, rpn_scores, rpn_deltas = model.apply(variables, images, train=train)
    featmap_sizes = [tuple(s.shape[1:3]) for s in rpn_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)
    flat_rpn_s, flat_rpn_d = flatten_rpn_outputs(rpn_scores, rpn_deltas)

    rngs = jax.random.split(rng, b * (1 + cfg.num_stages)).reshape(
        b, 1 + cfg.num_stages, -1
    )

    rpn_cls_l, rpn_reg_l = rpn_losses(
        cfg, anchors, flat_rpn_s, flat_rpn_d, gt_boxes, gt_labels, gt_valid,
        rngs[:, 0],
    )

    proposals = generate_proposals(
        cfg.proposal_train,
        cfg.anchor_generator,
        [jax.lax.stop_gradient(s) for s in rpn_scores],
        [jax.lax.stop_gradient(d) for d in rpn_deltas],
        img_shapes=img_shapes,
    )

    losses: Dict[str, jax.Array] = {
        "loss_rpn_cls": jnp.mean(rpn_cls_l),
        "loss_rpn_reg": jnp.mean(rpn_reg_l),
    }
    total = losses["loss_rpn_cls"] + losses["loss_rpn_reg"]

    boxes, box_valid = proposals.boxes, proposals.valid  # (B, P, 4), (B, P)
    num_pos_final = None
    stage_slates = []
    roi_levels = list(feats[: len(cfg.roi_strides)])
    for t in range(cfg.num_stages):
        assigner = cfg.stage_assigner(t)
        stds = cfg.stage_target_stds[t]
        n_cand = boxes.shape[1]

        def sample_one(i, boxes=boxes, box_valid=box_valid, assigner=assigner,
                       stds=stds, t=t, n_cand=n_cand):
            cand = jnp.concatenate([boxes[i], gt_boxes[i]], axis=0)
            cand_valid = jnp.concatenate([box_valid[i], gt_valid[i]], axis=0)
            assign = assigner(
                cand, gt_boxes[i], gt_valid[i], gt_labels[i], anchor_valid=cand_valid
            )
            pos = assign.assigned_gt_inds > 0
            neg = assign.assigned_gt_inds == 0
            idx, is_pos, is_valid = _sample_fixed(
                rngs[i, 1 + t], pos, neg, cfg.rcnn_num_samples, cfg.rcnn_pos_fraction
            )
            rois = cand[idx]
            labels = jnp.where(is_pos, assign.labels[idx], 0)
            safe_gt = jnp.clip(assign.assigned_gt_inds[idx] - 1, 0, gt_boxes.shape[1] - 1)
            matched = gt_boxes[i][safe_gt]
            reg_t = bbox2delta(rois, matched, cfg.rcnn_target_means, stds)
            from_gt = idx >= n_cand  # sampled out of the appended gt block
            return rois, labels, reg_t, is_pos, is_valid, from_gt, safe_gt

        (rois, roi_labels, roi_reg_t, roi_pos, roi_valid, roi_from_gt,
         roi_matched) = jax.vmap(sample_one)(jnp.arange(b))
        stage_slates.append({
            "rois": rois, "labels": roi_labels, "is_pos": roi_pos,
            "matched_gt": roi_matched,
        })

        roi_feats = batched_multilevel_roi_align(
            roi_levels, rois, cfg.roi_strides, cfg.roi_size,
            finest_scale=cfg.finest_scale,
        )
        cls_logits, reg_pred = model.apply(
            variables, roi_feats, t, train=train, method=CascadeRCNN.roi_forward
        )
        cls_logits = cls_logits.astype(jnp.float32)
        reg_pred = reg_pred.astype(jnp.float32)

        w_valid = roi_valid.astype(jnp.float32)
        n_valid = jnp.maximum(jnp.sum(w_valid), 1.0)
        cls_l = softmax_cross_entropy(
            cls_logits, roi_labels, weight=w_valid, avg_factor=n_valid
        )
        n_pos = jnp.maximum(jnp.sum(roi_pos), 1.0)
        reg_l = smooth_l1_loss(
            reg_pred, roi_reg_t, weight=roi_pos.astype(jnp.float32)[..., None],
            beta=cfg.smooth_l1_beta, avg_factor=n_pos,
        )
        w_stage = cfg.stage_loss_weights[t]
        losses[f"loss_s{t}_cls"] = cls_l
        losses[f"loss_s{t}_reg"] = reg_l
        total = total + w_stage * (cls_l + reg_l)
        num_pos_final = jnp.sum(roi_pos.astype(jnp.float32))

        if t + 1 < cfg.num_stages:
            refined = jax.vmap(
                lambda r, d: delta2bbox(r, d, cfg.rcnn_target_means, stds)
            )(rois, jax.lax.stop_gradient(reg_pred))
            boxes = _clip_boxes(refined, img_shapes)
            # drop gt-block rois from the next slate (the next stage re-adds
            # gt itself; a refined copy would double-count near-perfect
            # positives) — mmdet's pos_is_gts filtering
            box_valid = roi_valid & ~roi_from_gt

    losses["loss"] = total
    losses["num_pos_rois"] = num_pos_final
    return losses, feats, stage_slates


def cascade_rcnn_inference(
    cfg: CascadeRCNNConfig,
    model: CascadeRCNN,
    variables: Dict,
    images: jax.Array,
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Proposals -> S refine stages -> averaged scores -> per-class NMS."""
    feats, rpn_scores, rpn_deltas = model.apply(variables, images)
    proposals = generate_proposals(
        cfg.proposal_test, cfg.anchor_generator, rpn_scores, rpn_deltas, img_shapes
    )
    roi_levels = list(feats[: len(cfg.roi_strides)])

    boxes = proposals.boxes  # (B, P, 4)
    probs_sum = 0.0
    for t in range(cfg.num_stages):
        roi_feats = batched_multilevel_roi_align(
            roi_levels, boxes, cfg.roi_strides, cfg.roi_size,
            finest_scale=cfg.finest_scale,
        )
        cls_logits, reg_pred = model.apply(
            variables, roi_feats, t, method=CascadeRCNN.roi_forward
        )
        probs_sum = probs_sum + jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
        decoded = jax.vmap(
            lambda r, d: delta2bbox(
                r, d, cfg.rcnn_target_means, cfg.stage_target_stds[t]
            )
        )(boxes, reg_pred.astype(jnp.float32))
        boxes = _clip_boxes(decoded, img_shapes)

    probs = (probs_sum / cfg.num_stages)[..., 1:]  # drop background

    def one_image(i):
        scores = jnp.where(proposals.valid[i][:, None], probs[i], 0.0)
        res = multiclass_nms(
            boxes[i], scores,
            iou_thr=cfg.nms_iou_thr, score_thr=cfg.score_thr,
            pre_nms_top_k=min(1000, scores.size), max_out=cfg.max_detections,
            approx_top_k=cfg.approx_top_k,
        )
        out_boxes = res.boxes
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[i]
        return NMSResult(out_boxes, res.scores, res.labels, res.valid, res.indices)

    return jax.vmap(one_image)(jnp.arange(images.shape[0]))
