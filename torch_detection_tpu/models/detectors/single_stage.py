"""Single-stage detector (RetinaNet-style): backbone -> neck -> dense head,
plus jittable loss and fixed-shape inference functions.

Fills SURVEY.md §2 #33 (detector assembly, [ABSENT] in the reference).  The
registry/config surface mirrors the reference idiom: a detector is built from
``{'backbone': {...}, 'neck': {...}, 'head': {...}}`` dicts resolved against
the BACKBONES/NECKS/HEADS registries.

TPU design: the flax module produces raw per-level head outputs only; loss
(``retina_loss``) and decoding (``decode_detections``) are standalone pure
functions over fixed-shape padded batches, so the full train step and the
full inference step each compile to one XLA program (backbone conv stack on
the MXU, assignment + NMS as fused masked elementwise/top-k work).
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
from ...ops.losses import sigmoid_focal_loss_sparse, smooth_l1_loss
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows
from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS
from ..heads.anchor_head import flatten_head_outputs


@DETECTORS.register_module
class SingleStageDetector(nn.Module):
    """backbone cfg (+ optional neck cfg) + head cfg -> per-level outputs.

    ``neck=None`` feeds the backbone's multi-scale maps straight to the
    head (SSD style)."""

    backbone: Dict[str, Any]
    neck: Optional[Dict[str, Any]] = None
    head: Optional[Dict[str, Any]] = None

    def setup(self):
        assert self.head is not None, "SingleStageDetector requires a head cfg"
        self.backbone_mod = BACKBONES.build(dict(self.backbone), name="backbone")
        self.neck_mod = (
            NECKS.build(dict(self.neck), name="neck") if self.neck else None
        )
        self.head_mod = HEADS.build(dict(self.head), name="head")

    def __call__(self, images: jax.Array, train: bool = False):
        feats = self.backbone_mod(images, train=train)
        if self.neck_mod is not None:
            feats = self.neck_mod(feats, train=train)
        return self.head_mod(feats, train=train)


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    """Static (hashable) detection-time configuration."""

    num_classes: int = 80
    anchor_generator: AnchorGenerator = AnchorGenerator(
        strides=(8, 16, 32, 64, 128),
        ratios=(0.5, 1.0, 2.0),
        octave_base_scale=4.0,
        scales_per_octave=3,
    )
    target_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    assigner: MaxIoUAssigner = MaxIoUAssigner(
        pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0.0
    )
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_beta: float = 1.0 / 9.0
    reg_loss_weight: float = 1.0
    # inference
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    pre_select_per_level: int = 1000  # top anchors per level by max-class score
    pre_nms_top_k: int = 1000  # (box, class) pairs entering NMS
    max_detections: int = 100
    # Use jax.lax.approx_max_k for the candidate top-ks (preselect + NMS
    # pool).  ~2.5x faster than exact top_k on TPU for the big levels; the
    # misses are rank-skewed toward the tail of the top-k (the max is never
    # lost, rank-r elements are lost with prob ~ r/bins), so NMS candidate
    # recall at the scores that matter is ~1 and the mAP effect is noise.
    # Off by default so parity tests match exact-torch candidate sets.
    approx_top_k: bool = False
    # "hard" = greedy suppression (default); "soft" = soft-NMS (gaussian
    # decay, ops/nms.py soft_nms) — recovers occluded same-class objects at
    # the cost of a genuinely sequential max_detections-step scan.
    nms_method: str = "hard"
    soft_sigma: float = 0.5


def _per_image_targets(
    cfg: RetinaNetConfig,
    anchors: jax.Array,  # (N, 4)
    anchor_valid: jax.Array,  # (N,) bool
    gt_boxes: jax.Array,  # (G, 4)
    gt_labels: jax.Array,  # (G,)
    gt_valid: jax.Array,  # (G,) bool
):
    assign = cfg.assigner(anchors, gt_boxes, gt_valid, gt_labels, anchor_valid=anchor_valid)
    pos = assign.assigned_gt_inds > 0
    neg = assign.assigned_gt_inds == 0
    safe_gt = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_boxes.shape[0] - 1)
    # one-hot matmul, not gt_boxes[safe_gt]: the plain gather cost 11.3 ms
    # of a 28 ms loss tier @ b8 (see ops/tpu_gather.py)
    matched_gt = gather_rows(gt_boxes, safe_gt)
    reg_targets = bbox2delta(anchors, matched_gt, cfg.target_means, cfg.target_stds)
    # sparse cls targets: 0-based foreground class for positives, -1 for the
    # rest (labels are 1-based with 0 = background in the dataset contract).
    # Kept sparse so the focal loss never materializes an (N, C) one-hot —
    # see ops/losses.py _focal_sparse_elem.
    label0 = jnp.where(pos, assign.labels - 1, -1).astype(jnp.int32)
    return pos, neg, label0, reg_targets


def retina_loss(
    cfg: RetinaNetConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G) int32, 1-based
    gt_valid: jax.Array,  # (B, G) bool
    img_shapes: Optional[jax.Array] = None,  # (B, 2) un-padded (h, w)
) -> Dict[str, jax.Array]:
    """Focal + smooth-L1 loss over all levels, normalized by #positives."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)  # (N, 4)
    flat_cls, flat_reg = flatten_head_outputs(cls_scores, bbox_preds, cfg.num_classes)
    # flat_cls stays in the head's dtype (bf16): the sparse focal loss casts
    # elementwise inside its fused kernel, so the (B, N, C) f32 copy is
    # never materialized (it and its AD residuals were ~2 GB of HBM traffic
    # per COCO-scale step)
    flat_reg = flat_reg.astype(jnp.float32)

    if img_shapes is None:
        anchor_valid_fn = lambda i: jnp.ones((anchors.shape[0],), bool)
    else:
        centers_x = (anchors[:, 0] + anchors[:, 2]) * 0.5
        centers_y = (anchors[:, 1] + anchors[:, 3]) * 0.5

        def anchor_valid_fn(i):
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            return (centers_x < w) & (centers_y < h)

    def one_image(i):
        pos, neg, cls_t, reg_t = _per_image_targets(
            cfg, anchors, anchor_valid_fn(i), gt_boxes[i], gt_labels[i], gt_valid[i]
        )
        num_pos = jnp.sum(pos)
        cls_weight = (pos | neg)[:, None].astype(jnp.float32)
        cls_loss = sigmoid_focal_loss_sparse(
            flat_cls[i], cls_t, weight=cls_weight,
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha, avg_factor=num_pos,
        )
        reg_weight = pos[:, None].astype(jnp.float32)
        reg_loss = smooth_l1_loss(
            flat_reg[i], reg_t, weight=reg_weight,
            beta=cfg.smooth_l1_beta, avg_factor=num_pos,
        )
        return cls_loss, reg_loss, num_pos

    cls_losses, reg_losses, num_pos = jax.vmap(one_image)(
        jnp.arange(gt_boxes.shape[0])
    )
    loss_cls = jnp.mean(cls_losses)
    loss_reg = jnp.mean(reg_losses) * cfg.reg_loss_weight
    return {
        "loss_cls": loss_cls,
        "loss_reg": loss_reg,
        "loss": loss_cls + loss_reg,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def decode_detections(
    cfg: RetinaNetConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,  # (B, 2) for clipping
    scale_factors: Optional[jax.Array] = None,  # (B,) undo resize
) -> NMSResult:
    """Fixed-shape batched inference: per-level top-k preselect -> sigmoid
    scores -> delta decode -> class-wise NMS.  Returns (B, max_detections)
    padded.

    Preselection mirrors the standard RetinaNet ``nms_pre`` rule: within each
    pyramid level keep the top ``pre_select_per_level`` anchors by max-class
    score; this keeps every downstream tensor ~5k rows instead of ~150k,
    which is what makes single-kernel NMS cheap on TPU.
    """
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    level_anchors = cfg.anchor_generator.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]
    top_k_fn = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k
    c = cfg.num_classes

    sel_scores, sel_anchors, sel_regs = [], [], []
    for lvl, (cls_l, reg_l) in enumerate(zip(cls_scores, bbox_preds)):
        # NOTE: the f32 casts before max/top-k/gather look redundant (bf16
        # sort keys select the identical set) but are load-bearing: feeding
        # conv-produced bf16 tensors straight into gather/sort kernels
        # faults the current TPU runtime when fused into the model graph
        # (measured: the same decode graph on plain device arrays is fine).
        a_per = cls_l.shape[-1] // c  # anchors per position
        hwl = cls_l.shape[1] * cls_l.shape[2]
        k = min(cfg.pre_select_per_level, hwl * a_per)
        if a_per > 1 and hwl > k:
            # POSITION-granularity preselect (r4, ~6 ms/b32 over the anchor
            # form at 800x1216): keep the map in its native (B, H, W, A*C)
            # lane layout — the (B, N, C) anchor-major f32 copy pads C=80 to
            # 128 lanes (1.6x HBM) and its (B, N) top-k is A x larger.  Here:
            # top-k POSITIONS by position-max, fat-row gather (A*C lanes,
            # ~7% pad), then an EXACT small top-k down to k anchors.
            # Equivalence: a top-k anchor's position-max >= its score, so if
            # its position missed the position top-k there were k positions
            # with higher maxes, i.e. k higher-scoring anchors — contradiction.
            # Thus top-k positions ⊇ positions of top-k anchors, and the
            # second (exact) top-k recovers the identical anchor set when
            # top_k_fn is exact; under approx_max_k the misses stay
            # tail-rank-skewed at position granularity, same as before.
            pos = cls_l.reshape(b, hwl, a_per * c).astype(jnp.float32)
            regp = reg_l.reshape(b, hwl, a_per * 4).astype(jnp.float32)
            best_pos = jnp.max(pos, axis=-1)  # (B, HW)
            _, pidx = top_k_fn(best_pos, k)
            rows = jnp.take_along_axis(pos, pidx[..., None], axis=1)  # (B,k,A*C)
            rreg = jnp.take_along_axis(regp, pidx[..., None], axis=1)
            s_ka = rows.reshape(b, k, a_per, c)
            best_a = jnp.max(s_ka, axis=-1).reshape(b, k * a_per)
            _, aidx = jax.lax.top_k(best_a, k)  # exact; (B, k*A) is small
            s = jnp.take_along_axis(s_ka.reshape(b, k * a_per, c), aidx[..., None], axis=1)
            r = jnp.take_along_axis(rreg.reshape(b, k * a_per, 4), aidx[..., None], axis=1)
            gidx = jnp.take_along_axis(pidx, aidx // a_per, axis=1) * a_per + (aidx % a_per)
            a = level_anchors[lvl][gidx]
        else:
            s = cls_l.reshape(b, -1, c).astype(jnp.float32)  # (B, Nl, C)
            r = reg_l.reshape(b, -1, 4).astype(jnp.float32)
            n_l = s.shape[1]
            if k < n_l:
                best = jnp.max(s, axis=-1)  # (B, Nl)
                _, idx = top_k_fn(best, k)  # (B, k)
                s = jnp.take_along_axis(s, idx[..., None], axis=1)
                r = jnp.take_along_axis(r, idx[..., None], axis=1)
                a = level_anchors[lvl][idx]  # (B, k, 4)
            else:
                a = jnp.broadcast_to(level_anchors[lvl][None], (b, n_l, 4))
        sel_scores.append(s)
        sel_anchors.append(a)
        sel_regs.append(r)

    scores = jax.nn.sigmoid(jnp.concatenate(sel_scores, axis=1))  # (B, M, C)
    anchors_b = jnp.concatenate(sel_anchors, axis=1)  # (B, M, 4)
    flat_reg = jnp.concatenate(sel_regs, axis=1)  # (B, M, 4)

    def one_image(i):
        boxes = delta2bbox(
            anchors_b[i], flat_reg[i], cfg.target_means, cfg.target_stds,
            wh_ratio_clip=16 / 1000,
        )
        if img_shapes is not None:
            h = img_shapes[i, 0]
            w = img_shapes[i, 1]
            x = jnp.clip(boxes[:, 0::2], 0, w - 1.0)
            y = jnp.clip(boxes[:, 1::2], 0, h - 1.0)
            boxes = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        if cfg.nms_method == "soft":
            from ...ops.nms import multiclass_soft_nms

            res = multiclass_soft_nms(
                boxes,
                scores[i],
                sigma=cfg.soft_sigma,
                iou_thr=cfg.nms_iou_thr,
                score_thr=cfg.score_thr,
                pre_nms_top_k=cfg.pre_nms_top_k,
                max_out=cfg.max_detections,
                approx_top_k=cfg.approx_top_k,
            )
        else:
            res = multiclass_nms(
                boxes,
                scores[i],
                iou_thr=cfg.nms_iou_thr,
                score_thr=cfg.score_thr,
                pre_nms_top_k=cfg.pre_nms_top_k,
                max_out=cfg.max_detections,
                approx_top_k=cfg.approx_top_k,
            )
        out_boxes = res.boxes
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[i]
        return NMSResult(out_boxes, res.scores, res.labels, res.valid, res.indices)

    return jax.vmap(one_image)(jnp.arange(scores.shape[0]))
