"""FreeAnchor: learning-to-match anchor assignment (fourteenth family).

Zhang et al., "FreeAnchor: Learning to Match Anchors for Visual Object
Detection" (NeurIPS 2019).  The model is exactly the RetinaNet graph
(SingleStageDetector + RetinaHead) and the inference path is
``decode_detections`` unchanged — what changes is the TRAINING objective:
instead of a hard MaxIoU assignment, each gt owns a *bag* of candidate
anchors (top-k by anchor-gt IoU) and the loss maximizes a detection
likelihood in which the matching is free to settle on whichever bag member
jointly classifies and localizes best.

Reference lineage: the reference repo has no detection losses at all
(/root/reference/core/__init__.py is empty, SURVEY.md §2 #32-#33), so this
follows the published formulation (the same one mmdetection ships as
FreeAnchorRetinaHead):

* positive term, per gt j with bag B_j (k anchors):
    P_j = sum_i w_i * p_i,   p_i = cls_prob_i(c_j) * exp(-L_loc(i, j))
    w_i = (1 / (1 - p_i)) normalized over the bag  (the "mean-max" weight:
    early in training it averages the bag, converging it sharpens to max)
    loss+ = -alpha * log(P_j),  summed over gts, / num_gt
* negative term, per anchor n and class c:
    P_bg[n, c] = cls_prob[n, c] * (1 - object_box_prob[n, c])
    object_box_prob[n, c] = max over gts of class c of the saturated-linear
    IoU ramp  clip((iou(decoded_n, gt_j) - t) / (iou_max_j - t), 0, 1)
    loss- = (1-alpha) * sum P_bg^gamma * -log(1 - P_bg) / (num_gt * k)

TPU design notes:
* Everything is fixed-shape over the padded (G,) gt slate; invalid gt rows
  contribute exactly zero to both terms (their bag probs and box-prob rows
  are masked before the reductions).
* The per-class max over gts is one ``segment_max`` of the (G, N) ramp with
  the 0-based labels as segment ids — no (N, G, C) cube, no python loop.
* Bag gathers have small outputs (G x k rows), so plain indexing is optimal
  per the ops/tpu_gather.py rule (one-hot forms only pay for >=10k rows).
* IoU of decoded boxes is computed in f32; the decode consumes the f32-cast
  head output (bf16 conv outputs feeding top_k/gather crash the TPU
  runtime — see CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ...ops.boxes import bbox2delta, bbox_overlaps, delta2bbox
from ..heads.anchor_head import flatten_head_outputs
from .single_stage import RetinaNetConfig


@dataclasses.dataclass(frozen=True)
class FreeAnchorConfig(RetinaNetConfig):
    """RetinaNetConfig + the FreeAnchor bag-likelihood knobs.

    Inference (decode_detections) is inherited unchanged; only the loss
    differs.  Defaults follow the paper / mmdetection: bag size 50,
    box-prob IoU threshold 0.6, focal-style gamma 2 / alpha 0.5, and the
    0.75 weight on the smooth-l1 inside exp(-L_loc).
    """

    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    bag_gamma: float = 2.0
    bag_alpha: float = 0.5
    loc_loss_weight: float = 0.75


def _positive_bag_loss(probs: jax.Array, valid: jax.Array) -> jax.Array:
    """-log(mean-max likelihood) per bag.

    probs: (G, k) joint cls*loc probabilities; valid: (G,) gt validity.
    Invalid bags return 0.  The mean-max weight w_i ∝ 1/(1-p_i) is detached
    in neither the paper nor mmdet — gradients flow through both factors.
    """
    eps = 1e-12
    w = 1.0 / jnp.clip(1.0 - probs, eps, None)  # (G, k)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    bag_prob = jnp.sum(w * probs, axis=-1)  # (G,)
    loss = -jnp.log(jnp.clip(bag_prob, eps, None))
    return jnp.where(valid, loss, 0.0)


def free_anchor_loss(
    cfg: FreeAnchorConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G) int32, 1-based
    gt_valid: jax.Array,  # (B, G) bool
    img_shapes: Optional[jax.Array] = None,  # unused (kept for API parity)
) -> Dict[str, jax.Array]:
    """FreeAnchor detection-likelihood loss over all pyramid levels."""
    del img_shapes
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)  # (N, 4)
    flat_cls, flat_reg = flatten_head_outputs(cls_scores, bbox_preds, cfg.num_classes)
    flat_reg = flat_reg.astype(jnp.float32)
    num_classes = cfg.num_classes
    k = cfg.pre_anchor_topk
    n_anchors = anchors.shape[0]

    def one_image(cls_logits, reg_pred, boxes, labels, valid):
        cls_prob = jax.nn.sigmoid(cls_logits.astype(jnp.float32))  # (N, C)
        label0 = jnp.clip(labels - 1, 0, num_classes - 1).astype(jnp.int32)

        # --- negative term -------------------------------------------------
        decoded = delta2bbox(anchors, reg_pred, cfg.target_means, cfg.target_stds)
        iou = bbox_overlaps(boxes, decoded)  # (G, N) f32
        iou = jnp.where(valid[:, None], iou, 0.0)
        t1 = cfg.bbox_thr
        t2 = jnp.max(iou, axis=1, keepdims=True)
        # denominator floor must survive f32 (t1 + 1e-12 rounds back to t1,
        # making the ramp a 0/0 whose clipped primal hides NaN gradients)
        denom = jnp.maximum(t2 - t1, 1e-6)
        box_prob = jnp.clip((iou - t1) / denom, 0.0, 1.0)  # (G, N)
        box_prob = jnp.where(valid[:, None], box_prob, 0.0)
        # per-class max over gts: segment_max of the G rows into C buckets;
        # classes with no gt get the -inf identity -> clamp to 0.
        obj_box_prob = jax.ops.segment_max(
            box_prob, label0, num_segments=num_classes
        )  # (C, N)
        obj_box_prob = jnp.maximum(obj_box_prob, 0.0).T  # (N, C)
        p_bg = cls_prob * (1.0 - obj_box_prob)
        p_bg = jnp.clip(p_bg, 0.0, 1.0 - 1e-12)
        neg_loss = jnp.sum(p_bg ** cfg.bag_gamma * -jnp.log1p(-p_bg))

        # --- positive term -------------------------------------------------
        anchor_iou = bbox_overlaps(boxes, anchors.astype(jnp.float32))  # (G, N)
        _, bag_idx = jax.lax.top_k(anchor_iou, k)  # (G, k) indices into N
        # small-output gathers (G*k rows) — plain indexing per tpu_gather rule
        flat_idx = bag_idx * num_classes + label0[:, None]  # (G, k)
        matched_cls = cls_prob.reshape(-1)[flat_idx]  # (G, k)
        matched_anchors = anchors[bag_idx]  # (G, k, 4)
        matched_reg = reg_pred[bag_idx]  # (G, k, 4)
        targets = bbox2delta(
            matched_anchors, boxes[:, None, :], cfg.target_means, cfg.target_stds
        )  # (G, k, 4)
        diff = jnp.abs(matched_reg - targets)
        beta = cfg.smooth_l1_beta
        loc = jnp.where(
            diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta
        ).sum(-1)  # (G, k) unreduced huber (ops.smooth_l1_loss always reduces)
        matched_box = jnp.exp(-cfg.loc_loss_weight * loc)
        pos_loss = jnp.sum(
            _positive_bag_loss(matched_cls * matched_box, valid)
        )
        num_pos = jnp.sum(valid.astype(jnp.float32))
        return pos_loss, neg_loss, num_pos

    pos_losses, neg_losses, num_pos = jax.vmap(one_image)(
        flat_cls, flat_reg, gt_boxes.astype(jnp.float32),
        gt_labels.astype(jnp.int32), gt_valid,
    )
    total_pos = jnp.clip(jnp.sum(num_pos), 1.0, None)
    loss_pos = cfg.bag_alpha * jnp.sum(pos_losses) / total_pos
    loss_neg = (1.0 - cfg.bag_alpha) * jnp.sum(neg_losses) / (total_pos * k)
    del n_anchors
    return {
        "loss_pos": loss_pos,
        "loss_neg": loss_neg,
        "loss": loss_pos + loss_neg,
        "num_pos": jnp.sum(num_pos) / num_pos.shape[0],
    }
