"""PAA: probabilistic anchor assignment with GMM score separation.

Fifteenth detector family (Kim & Lee, "Probabilistic Anchor Assignment
with IoU Prediction for Object Detection", ECCV 2020).  The model graph is
ATSS's (one anchor per location, cls + reg + IoU-prediction branches); the
assignment is learned per step: every anchor initially matched to a gt
(loose MaxIoU at 0.1) is scored by its CURRENT detection loss, each gt's
per-level top-k lowest-loss anchors form its candidate set, a 2-component
1-D Gaussian mixture is fit to the candidate scores, and the low-loss
component's members (up to its likelihood mode — scheme (c) in the paper's
Fig. 3) become the positives.  At test time the IoU branch rescales class
scores (sqrt(cls * iou)) and score voting refines each kept box by a
score-and-proximity-weighted average of the pre-NMS candidates.

Reference lineage: the reference repo has no detector tier at all
(/root/reference/models/__init__.py is empty — SURVEY.md §2 #33); the
formulation follows the paper and mmdetection's PAAHead (loss weights 1.3
GIoU / 0.5 IoU-BCE, topk 9, initial MaxIoU thresholds 0.1, voting kernel
exp(-(1-iou)^2 / 0.025)).

TPU design notes (SURVEY §7 hard part (c) — fixed-shape formulations of
data-dependent ops):
* The official implementation ships candidate losses to the host and runs
  ``sklearn.mixture.GaussianMixture`` per gt inside the train step; here
  the EM is ``ops.gmm.gmm_em_1d`` — fixed-iteration lax loops vmapped over
  (batch x gt), never leaving the device.
* Candidate selection is a per-(gt, level) top-k over the masked loss map
  (+inf outside the gt's assigned set); padded slots stay +inf and carry
  zero weight everywhere downstream.  The top-k rides ``approx_max_k``
  under the repo-wide ``approx_top_k`` flag (exact sorts at anchor scale
  are ~19x slower — see the FreeAnchor note in CLAUDE.md).
* The separation scheme is rank arithmetic on the loss-sorted slate
  (cumsum of the component-0 mask), not data-dependent slicing.
* Anchor-scale gathers use ``ops.tpu_gather`` one-hot contractions; the
  candidate-scale (G x L*k) gathers are small-output and stay plain.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.anchors import AnchorGenerator
from ...ops.assign import MaxIoUAssigner
from ...ops.boxes import delta2bbox
from ...ops.gmm import gmm_em_1d
from ...ops.losses import (
    _focal_sparse_elem,
    binary_cross_entropy,
    iou_loss,
    sigmoid_focal_loss_sparse,
)
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows


@dataclasses.dataclass(frozen=True)
class PAAConfig:
    num_classes: int = 80
    anchor_generator: AnchorGenerator = AnchorGenerator(
        strides=(8, 16, 32, 64, 128),
        ratios=(1.0,),
        octave_base_scale=8.0,
        scales_per_octave=1,
    )
    target_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    # initial loose matching that defines each gt's candidate pool
    assigner: MaxIoUAssigner = MaxIoUAssigner(
        pos_iou_thr=0.1, neg_iou_thr=0.1, min_pos_iou=0.0
    )
    topk: int = 9  # candidates per level per gt
    gmm_iters: int = 25
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    reg_loss_weight: float = 1.3
    iou_loss_weight: float = 0.5
    # inference
    score_thr: float = 0.05
    nms_iou_thr: float = 0.6
    pre_select_per_level: int = 1000
    pre_nms_top_k: int = 1000
    max_detections: int = 100
    score_voting: bool = True
    voting_sigma: float = 0.025  # exp(-(1-iou)^2 / sigma) proximity kernel
    approx_top_k: bool = False


def _level_counts(cfg: PAAConfig, featmap_sizes) -> Tuple[int, ...]:
    a = cfg.anchor_generator.num_base_anchors
    return tuple(h * w * a for (h, w) in featmap_sizes)


def _aligned_iou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of matching (..., 4) inclusive-xyxy box pairs."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:4], target[..., 2:4])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_p = (pred[..., 2] - pred[..., 0] + 1.0) * (pred[..., 3] - pred[..., 1] + 1.0)
    area_t = (target[..., 2] - target[..., 0] + 1.0) * (target[..., 3] - target[..., 1] + 1.0)
    return inter / jnp.maximum(area_p + area_t - inter, 1e-6)


def _aligned_giou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of matching (..., 4) inclusive-xyxy box pairs."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:4], target[..., 2:4])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_p = (pred[..., 2] - pred[..., 0] + 1.0) * (pred[..., 3] - pred[..., 1] + 1.0)
    area_t = (target[..., 2] - target[..., 0] + 1.0) * (target[..., 3] - target[..., 1] + 1.0)
    union = jnp.maximum(area_p + area_t - inter, 1e-6)
    elt = jnp.minimum(pred[..., :2], target[..., :2])
    erb = jnp.maximum(pred[..., 2:4], target[..., 2:4])
    ewh = jnp.clip(erb - elt + 1.0, 0.0, None)
    enc = jnp.maximum(ewh[..., 0] * ewh[..., 1], 1e-6)
    return inter / union - (enc - union) / enc


def paa_reassign(
    cfg: PAAConfig,
    anchor_loss: jnp.ndarray,  # (N,) per-anchor candidate loss (stop-grad)
    assigned_gt: jnp.ndarray,  # (N,) int32 in {-1, 0, 1..G} (MaxIoU result)
    gt_valid: jnp.ndarray,  # (G,) bool
    level_counts: Tuple[int, ...],
) -> jnp.ndarray:
    """GMM-split positives: (N,) int32 in {0, 1..G} (0 = background).

    Per gt: per-level top-k lowest-loss assigned anchors -> candidate
    slate -> 2-component EM on the candidate losses -> positives are the
    low-loss component's members up to its likelihood mode (scheme (c)).
    """
    g = gt_valid.shape[0]
    k = cfg.topk
    big = jnp.float32(3e38)
    top_sel = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k

    starts = []
    s = 0
    for c in level_counts:
        starts.append(s)
        s += c

    def one_gt(gi):
        mine = assigned_gt == (gi + 1)  # (N,)
        masked = jnp.where(mine, anchor_loss, big)
        cand_loss, cand_idx = [], []
        for lvl, (st, cnt) in enumerate(zip(starts, level_counts)):
            lv = jax.lax.dynamic_slice_in_dim(masked, st, cnt)
            kk = min(k, cnt)
            neg_v, idx = top_sel(-lv, kk)  # lowest loss first
            v = -neg_v
            if kk < k:  # tiny level: pad to the fixed slate width
                v = jnp.pad(v, (0, k - kk), constant_values=big)
                idx = jnp.pad(idx, (0, k - kk))
            cand_loss.append(v)
            cand_idx.append(idx + st)
        cand_loss = jnp.concatenate(cand_loss)  # (L*k,)
        cand_idx = jnp.concatenate(cand_idx)
        cand_valid = (cand_loss < big * 0.5) & gt_valid[gi]

        # loss-ascending slate (scheme (c) reasons about this order)
        order = jnp.argsort(jnp.where(cand_valid, cand_loss, big))
        s_loss = cand_loss[order]
        s_idx = cand_idx[order]
        s_valid = cand_valid[order]

        res = gmm_em_1d(s_loss, s_valid, n_iter=cfg.gmm_iters)
        # the low-LOSS component is the positive one; the min/max init makes
        # that component 0, but guard against EM crossing the means
        lo = jnp.argmin(res.means)
        r_lo = jnp.take_along_axis(res.resp, jnp.full((res.resp.shape[0], 1), lo), axis=1)[:, 0]
        comp0 = (r_lo >= 0.5) & s_valid
        # positives: component-0 members up to the one with max mixture
        # likelihood (the component-0 mode) — rank arithmetic, fixed shape
        rank = jnp.cumsum(comp0.astype(jnp.int32)) - 1
        score = jnp.where(comp0, res.log_prob, -jnp.inf)
        best_rank = jnp.where(
            jnp.any(comp0), rank[jnp.argmax(score)], -1
        )
        pos = comp0 & (rank <= best_rank)
        return s_idx, pos

    idxs, poss = jax.vmap(one_gt)(jnp.arange(g))  # (G, L*k)

    # scatter winners back to anchors: candidate pools are disjoint across
    # gts (each anchor has ONE MaxIoU-assigned gt), so no conflicts; losers
    # (and everything unassigned) become background
    n = assigned_gt.shape[0]
    flat_idx = jnp.where(poss, idxs, n).reshape(-1)  # overflow slot for non-pos
    flat_gt = jnp.broadcast_to(
        jnp.arange(1, g + 1, dtype=jnp.int32)[:, None], idxs.shape
    ).reshape(-1)
    out = jnp.zeros((n + 1,), jnp.int32).at[flat_idx].set(flat_gt)[:n]
    return out


def _flatten(cfg, cls_scores, bbox_preds, iou_preds):
    b = cls_scores[0].shape[0]
    fc = jnp.concatenate([s.reshape(b, -1, cfg.num_classes) for s in cls_scores], 1)
    fr = jnp.concatenate([r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds], 1)
    fi = jnp.concatenate([c.reshape(b, -1).astype(jnp.float32) for c in iou_preds], 1)
    return fc, fr, fi


def paa_loss(
    cfg: PAAConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    iou_preds: Sequence[jax.Array],  # the head's centerness branch = IoU pred
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G) 1-based
    gt_valid: jax.Array,  # (B, G)
    img_shapes: Optional[jax.Array] = None,  # (B, 2) un-padded (h, w)
) -> Dict[str, jax.Array]:
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)  # (N, 4)
    level_counts = _level_counts(cfg, featmap_sizes)
    fc, fr, fi = _flatten(cfg, cls_scores, bbox_preds, iou_preds)

    centers_x = (anchors[:, 0] + anchors[:, 2]) * 0.5
    centers_y = (anchors[:, 1] + anchors[:, 3]) * 0.5

    def one_image(i):
        if img_shapes is None:
            anchor_valid = jnp.ones((anchors.shape[0],), bool)
        else:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            anchor_valid = (centers_x < w) & (centers_y < h)

        assign = cfg.assigner(
            anchors, gt_boxes[i], gt_valid[i], gt_labels[i],
            anchor_valid=anchor_valid,
        )
        init_pos = assign.assigned_gt_inds > 0
        safe_gt = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_boxes.shape[1] - 1)
        matched0 = gather_rows(gt_boxes[i], safe_gt)  # (N, 4)
        label0_init = jnp.where(init_pos, assign.labels - 1, -1).astype(jnp.int32)

        # candidate score = current detection loss (assignment only — the
        # official code computes it under no_grad)
        cls_elem = jnp.sum(
            _focal_sparse_elem(
                jax.lax.stop_gradient(fc[i]), label0_init,
                cfg.focal_gamma, cfg.focal_alpha,
            ),
            axis=-1,
        )  # (N,)
        decoded_sg = delta2bbox(
            anchors, jax.lax.stop_gradient(fr[i]),
            cfg.target_means, cfg.target_stds, wh_ratio_clip=16 / 1000,
        )
        anchor_loss = cls_elem + (1.0 - _aligned_giou(decoded_sg, matched0))

        reassigned = paa_reassign(
            cfg, anchor_loss, assign.assigned_gt_inds, gt_valid[i], level_counts,
        )
        pos = reassigned > 0
        safe2 = jnp.clip(reassigned - 1, 0, gt_boxes.shape[1] - 1)
        matched = gather_rows(gt_boxes[i], safe2)
        lab = gather_rows(gt_labels[i].astype(jnp.float32), safe2).astype(jnp.int32)
        label0 = jnp.where(pos, lab - 1, -1)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

        cls_l = sigmoid_focal_loss_sparse(
            fc[i], label0, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
            avg_factor=num_pos,
        )
        decoded = delta2bbox(
            anchors, fr[i], cfg.target_means, cfg.target_stds,
            wh_ratio_clip=16 / 1000,
        )
        # mmdet PAA: GIoU weighted by the (detached) IoU of the current
        # prediction with its target, averaged by that weight's sum
        iou_t = jax.lax.stop_gradient(_aligned_iou(decoded, matched))
        w_reg = jnp.where(pos, jnp.maximum(iou_t, 1e-6), 0.0)
        reg_l = iou_loss(
            decoded, matched, weight=w_reg, mode="giou",
            avg_factor=jnp.maximum(jnp.sum(w_reg), 1e-6),
        )
        iou_l = binary_cross_entropy(
            fi[i], iou_t, weight=pos.astype(jnp.float32), avg_factor=num_pos
        )
        return cls_l, reg_l, iou_l, jnp.sum(pos)

    cls_l, reg_l, iou_l, num_pos = jax.vmap(one_image)(jnp.arange(gt_boxes.shape[0]))
    loss_cls = jnp.mean(cls_l)
    loss_reg = jnp.mean(reg_l) * cfg.reg_loss_weight
    loss_iou = jnp.mean(iou_l) * cfg.iou_loss_weight
    return {
        "loss_cls": loss_cls,
        "loss_reg": loss_reg,
        "loss_iou": loss_iou,
        "loss": loss_cls + loss_reg + loss_iou,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def _score_voting(
    cfg: PAAConfig,
    det: NMSResult,  # one image: (D, ...) from multiclass_nms
    cand_boxes: jnp.ndarray,  # (K, 4) decoded pre-NMS candidates
    cand_scores: jnp.ndarray,  # (K, C) combined sqrt(cls*iou) scores
) -> jnp.ndarray:
    """Refine each kept box by the score-weighted average of nearby
    candidates of its class (paper sec. 3.3; kernel exp(-(1-iou)^2/sigma))."""
    d = det.boxes.shape[0]
    iou = jax.vmap(lambda b: _aligned_iou(b[None], cand_boxes))(det.boxes)  # (D, K)
    # candidate score at each det's class: (K, C) x one-hot(D, C) -> (K, D)
    onehot = jax.nn.one_hot(
        jnp.clip(det.labels, 0, cand_scores.shape[1] - 1),
        cand_scores.shape[1], dtype=jnp.float32,
    )  # (D, C)
    sc = jax.lax.dot(
        cand_scores, onehot.T, precision=jax.lax.Precision.HIGHEST
    ).T  # (D, K)
    w = jnp.where(
        (iou > 0.01) & (sc > cfg.score_thr),
        sc * jnp.exp(-jnp.square(1.0 - iou) / cfg.voting_sigma),
        0.0,
    )
    denom = jnp.sum(w, axis=1, keepdims=True)
    voted = jax.lax.dot(
        w, cand_boxes.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
    ) / jnp.maximum(denom, 1e-6)
    use = det.valid[:, None] & (denom > 1e-6)
    return jnp.where(use, voted, det.boxes)


def decode_paa(
    cfg: PAAConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    iou_preds: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Per-level preselect -> delta decode -> sqrt(cls*iou)-scored NMS ->
    optional score voting over the pre-NMS candidates."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    level_anchors = cfg.anchor_generator.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]
    top_k_fn = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k

    sel_s, sel_a, sel_r, sel_i = [], [], [], []
    for lvl, (s_l, r_l, i_l) in enumerate(zip(cls_scores, bbox_preds, iou_preds)):
        # f32 casts before top-k/gather are load-bearing on the TPU runtime
        # (see decode_detections NOTE in single_stage.py)
        s = s_l.reshape(b, -1, cfg.num_classes).astype(jnp.float32)
        r = r_l.reshape(b, -1, 4).astype(jnp.float32)
        c = i_l.reshape(b, -1).astype(jnp.float32)
        n_l = s.shape[1]
        k = min(cfg.pre_select_per_level, n_l)
        if k < n_l:
            best = jnp.max(s, axis=-1)
            _, idx = top_k_fn(best, k)
            s = jnp.take_along_axis(s, idx[..., None], axis=1)
            r = jnp.take_along_axis(r, idx[..., None], axis=1)
            c = jnp.take_along_axis(c, idx, axis=1)
            a = level_anchors[lvl][idx]
        else:
            a = jnp.broadcast_to(level_anchors[lvl][None], (b, n_l, 4))
        sel_s.append(s)
        sel_a.append(a)
        sel_r.append(r)
        sel_i.append(c)

    scores = jax.nn.sigmoid(jnp.concatenate(sel_s, 1))
    anchors_b = jnp.concatenate(sel_a, 1)
    regs = jnp.concatenate(sel_r, 1)
    iop = jax.nn.sigmoid(jnp.concatenate(sel_i, 1))

    def one_image(i):
        boxes = delta2bbox(
            anchors_b[i], regs[i], cfg.target_means, cfg.target_stds,
            wh_ratio_clip=16 / 1000,
        )
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            x = jnp.clip(boxes[:, 0::2], 0, w - 1.0)
            y = jnp.clip(boxes[:, 1::2], 0, h - 1.0)
            boxes = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        combined = jnp.sqrt(
            jnp.clip(scores[i] * iop[i][:, None], 1e-12, None)
        )
        res = multiclass_nms(
            boxes, combined,
            iou_thr=cfg.nms_iou_thr, score_thr=cfg.score_thr,
            pre_nms_top_k=cfg.pre_nms_top_k, max_out=cfg.max_detections,
            approx_top_k=cfg.approx_top_k,
        )
        out_boxes = res.boxes
        if cfg.score_voting:
            out_boxes = _score_voting(
                cfg, NMSResult(out_boxes, res.scores, res.labels, res.valid,
                               res.indices),
                boxes, combined,
            )
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[i]
        return NMSResult(out_boxes, res.scores, res.labels, res.valid, res.indices)

    return jax.vmap(one_image)(jnp.arange(b))
