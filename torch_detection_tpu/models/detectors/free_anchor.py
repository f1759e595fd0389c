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
from ...ops.tpu_gather import gather_rows
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


def _positive_bag_loss(log_probs: jax.Array, valid: jax.Array) -> jax.Array:
    """-log(mean-max likelihood) per bag, computed in log space.

    log_probs: (G, k) log joint cls*loc probabilities; valid: (G,) gt
    validity.  Invalid bags return 0.  The mean-max weight w_i ∝ 1/(1-p_i)
    is detached in neither the paper nor mmdet — gradients flow through
    both factors.

    Log space is load-bearing: at init every joint prob is ~1e-15 (cls
    sigmoid at the 0.01 prior x exp(-huber)), so a prob-space
    -log(clip(bag_prob, eps)) sits on the clip's flat side with ZERO
    gradient and training never leaves the saturated regime.  The
    -logsumexp form's gradient is a softmax over the bag — healthy
    arbitrarily deep in saturation (torch reaches the same place via
    BCE's internal log clamping).
    """
    eps = 1e-12
    probs = jnp.exp(log_probs)  # may underflow to 0; only feeds the weight
    w = 1.0 / jnp.clip(1.0 - probs, eps, None)  # (G, k)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    loss = -jax.scipy.special.logsumexp(log_probs + jnp.log(w), axis=-1)
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
        # The decode->IoU->ramp block is gradient-detached, matching the
        # official FreeAnchor / mmdet formulation (their object_box_prob is
        # computed under torch.no_grad()): the background bag loss must not
        # push regression gradients into background-scored anchors, and
        # detaching also skips an entire (G, N) decode+IoU backward.
        decoded = jax.lax.stop_gradient(
            delta2bbox(anchors, reg_pred, cfg.target_means, cfg.target_stds)
        )
        iou = bbox_overlaps(boxes, decoded)  # (G, N) f32
        iou = jnp.where(valid[:, None], iou, 0.0)
        t1 = cfg.bbox_thr
        t2 = jnp.max(iou, axis=1, keepdims=True)
        # denominator floor must survive f32 (t1 + 1e-12 rounds back to t1,
        # making the ramp a 0/0 whose clipped primal hides NaN gradients)
        denom = jnp.maximum(t2 - t1, 1e-6)
        box_prob = jnp.clip((iou - t1) / denom, 0.0, 1.0)  # (G, N)
        box_prob = jnp.where(valid[:, None], box_prob, 0.0)

        def _f(p):
            # focal-weighted background BCE.  The clip ceiling must be
            # representable in f32: 1 - 1e-12 rounds back to 1.0, making the
            # clip a no-op and -log1p(-1) = inf once a sigmoid saturates
            # (seen at ~150 train steps on the golden fixture).
            p = jnp.clip(p, 0.0, 1.0 - 1e-6)
            return p ** cfg.bag_gamma * -jnp.log1p(-p)

        # sum_{n,c} f(cls * (1 - obj_box_prob)) without materializing the
        # per-class max over gts: XLA lowers segment_max's (G -> C) scatter
        # at N=182k width ~15x off memory roofline (measured 11 ms of a
        # 28 ms tier @ b8).  Only the <= G label columns have obj > 0, so
        #   neg = sum f(cls)                                [dense, no scatter]
        #       + sum_{g first-of-label} sum_n  f(cls_g * (1-objmax_g))
        #                                      - f(cls_g)   [correction]
        # where objmax_g = max over gts sharing g's label (a static G-step
        # loop of (G, N) maxes, G is small) and "first" dedups shared labels.
        eq = (
            (label0[:, None] == label0[None, :])
            & valid[:, None] & valid[None, :]
        )  # (G, G)
        order = jnp.arange(label0.shape[0])
        first = valid & ~jnp.any(eq & (order[None, :] < order[:, None]), axis=1)
        objmax = jnp.zeros_like(box_prob)
        for g in range(label0.shape[0]):  # static G, fused by XLA
            objmax = jnp.maximum(
                objmax, jnp.where(eq[:, g][:, None], box_prob[g][None, :], 0.0)
            )
        # label columns of cls_prob as a one-hot contraction (exact; the
        # (G, N) output is too large for plain column gathers on TPU)
        cls_sel = gather_rows(cls_prob.T, label0)  # (G, N)
        corr = _f(cls_sel * (1.0 - objmax)) - _f(cls_sel)
        neg_loss = jnp.sum(_f(cls_prob)) + jnp.sum(
            jnp.where(first[:, None], corr, 0.0)
        )

        # --- positive term -------------------------------------------------
        anchor_iou = bbox_overlaps(boxes, anchors.astype(jnp.float32))  # (G, N)
        # exact top_k over (G, 182k) costs 68 ms @ b8 where approx_max_k is
        # free (3.8 ms incl. the IoU); approx misses are tail-ranked bag
        # members whose joint prob the mean-max weight ignores anyway —
        # gated on the repo-wide approx_top_k flag (default False = exact
        # parity with the published formulation)
        if cfg.approx_top_k:
            _, bag_idx = jax.lax.approx_max_k(anchor_iou, k)  # (G, k)
        else:
            _, bag_idx = jax.lax.top_k(anchor_iou, k)  # (G, k) indices into N
        # small-output gathers (G*k rows) — plain indexing per tpu_gather rule
        flat_idx = bag_idx * num_classes + label0[:, None]  # (G, k)
        matched_logit = cls_logits.astype(jnp.float32).reshape(-1)[flat_idx]
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
        # log joint prob: log_sigmoid(cls) + log exp(-w*loc); stays exact
        # where the prob-space product underflows f32 (see _positive_bag_loss)
        log_joint = jax.nn.log_sigmoid(matched_logit) - cfg.loc_loss_weight * loc
        pos_loss = jnp.sum(_positive_bag_loss(log_joint, valid))
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
