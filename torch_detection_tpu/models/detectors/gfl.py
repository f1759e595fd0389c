"""GFL detector: quality focal + distribution focal + GIoU losses.

Eleventh detector family (Generalized Focal Loss, Li et al., NeurIPS 2020),
beyond the reference (TCGGroup/Torch_Detection has no detector tier —
SURVEY.md §2 #33 [ABSENT]).  Skeleton shared with ATSS: one anchor per
location (``octave_base_scale=8``), adaptive mean+std IoU assignment
(``ops.assign.ATSSAssigner``).  What changes:

  * the classification score IS the localization quality: positives are
    supervised with the decoded box's IoU against their gt (Quality Focal
    Loss, a BCE with ``|y - p|^beta`` modulation) — no centerness branch;
  * each of the four ltrb distances is a discrete distribution over
    ``reg_max + 1`` bins of the level stride; the box is its expectation
    (integral), and the Distribution Focal Loss pulls probability mass onto
    the two bins bracketing the target distance.

TPU formulation: everything is dense and fixed-shape.  The integral is one
softmax + a (4, n+1) @ (n+1,) contraction per location; QFL is computed
densely over the (N, C) score map (N ≈ 20k at the COCO canvas — one anchor
per location keeps this 9x smaller than RetinaNet's anchor grid); the DFL
bin selection uses one-hot contractions rather than gathers (large-output
gathers run ~10x off roofline on TPU — see ops/tpu_gather.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.anchors import AnchorGenerator
from ...ops.assign import ATSSAssigner
from ...ops.losses import iou_loss, optax_sigmoid_ce
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows


@dataclasses.dataclass(frozen=True)
class GFLConfig:
    num_classes: int = 80
    anchor_generator: AnchorGenerator = AnchorGenerator(
        strides=(8, 16, 32, 64, 128),
        ratios=(1.0,),
        octave_base_scale=8.0,
        scales_per_octave=1,
    )
    assigner: ATSSAssigner = ATSSAssigner(topk=9)
    reg_max: int = 16
    qfl_beta: float = 2.0
    qfl_weight: float = 1.0
    dfl_weight: float = 0.25
    giou_weight: float = 2.0
    # inference
    score_thr: float = 0.05
    nms_iou_thr: float = 0.6
    pre_select_per_level: int = 1000
    pre_nms_top_k: int = 1000
    max_detections: int = 100
    approx_top_k: bool = False


def integral(reg: jax.Array, reg_max: int) -> jax.Array:
    """(..., 4*(reg_max+1)) logits -> (..., 4) expected ltrb in bin units."""
    n1 = reg_max + 1
    p = jax.nn.softmax(reg.reshape(reg.shape[:-1] + (4, n1)), axis=-1)
    return p @ jnp.arange(n1, dtype=p.dtype)


def _aligned_iou(a: jax.Array, b: jax.Array, offset: float = 1.0) -> jax.Array:
    """Elementwise IoU between matching (..., 4) xyxy pairs (inclusive +1
    pixel convention, matching iou_loss / the data tier)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:4], b[..., 2:4])
    wh = jnp.clip(rb - lt + offset, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[..., 2] - a[..., 0] + offset) * (a[..., 3] - a[..., 1] + offset)
    ab = (b[..., 2] - b[..., 0] + offset) * (b[..., 3] - b[..., 1] + offset)
    return inter / jnp.maximum(aa + ab - inter, 1e-7)


def _level_strides(cfg: GFLConfig, featmap_sizes) -> jnp.ndarray:
    """(N,) per-anchor stride vector (static level counts)."""
    a = cfg.anchor_generator.num_base_anchors
    parts = [
        jnp.full((h * w * a,), float(s), jnp.float32)
        for (h, w), s in zip(featmap_sizes, cfg.anchor_generator.strides)
    ]
    return jnp.concatenate(parts)


def _flatten(cfg: GFLConfig, cls_scores, bbox_preds):
    b = cls_scores[0].shape[0]
    n1 = 4 * (cfg.reg_max + 1)
    fc = jnp.concatenate([s.reshape(b, -1, cfg.num_classes) for s in cls_scores], 1)
    fr = jnp.concatenate([r.reshape(b, -1, n1).astype(jnp.float32) for r in bbox_preds], 1)
    return fc, fr


def gfl_loss(
    cfg: GFLConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G) 1-based
    gt_valid: jax.Array,  # (B, G)
    img_shapes: Optional[jax.Array] = None,  # (B, 2) un-padded (h, w)
) -> Dict[str, jax.Array]:
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)  # (N, 4)
    a = cfg.anchor_generator.num_base_anchors
    level_counts = tuple(h * w * a for (h, w) in featmap_sizes)
    strides = _level_strides(cfg, featmap_sizes)  # (N,)
    fc, fr = _flatten(cfg, cls_scores, bbox_preds)

    cx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    cy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    if img_shapes is None:
        anchor_valid_fn = lambda i: jnp.ones((anchors.shape[0],), bool)
    else:
        def anchor_valid_fn(i):
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            return (cx < w) & (cy < h)

    level_grids = None
    if a == 1:  # windowed exact top-k candidate path (ops/assign.py)
        level_grids = tuple(
            (h, w, float(s))
            for (h, w), s in zip(featmap_sizes, cfg.anchor_generator.strides)
        )

    n1 = cfg.reg_max + 1
    bins = jnp.arange(n1, dtype=jnp.float32)

    def one_image(i):
        assign = cfg.assigner(
            anchors, level_counts, gt_boxes[i], gt_valid[i], gt_labels[i],
            anchor_valid=anchor_valid_fn(i), level_grids=level_grids,
            img_hw=None if img_shapes is None else img_shapes[i],
        )
        pos = assign.assigned_gt_inds > 0
        safe_gt = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_boxes.shape[1] - 1)
        matched = gather_rows(gt_boxes[i], safe_gt)  # (N, 4)
        label0 = jnp.where(pos, assign.labels - 1, -1).astype(jnp.int32)
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)

        logits = fc[i].astype(jnp.float32)
        dist = integral(fr[i], cfg.reg_max)  # (N, 4) bin units
        boxes = jnp.stack(
            [cx - dist[:, 0] * strides, cy - dist[:, 1] * strides,
             cx + dist[:, 2] * strides, cy + dist[:, 3] * strides], -1,
        )

        # ---- quality targets: IoU of the CURRENT decoded box vs its gt ----
        quality = jnp.where(
            pos, jax.lax.stop_gradient(_aligned_iou(boxes, matched)), 0.0
        )

        # ---- QFL (dense): y = onehot(label) * quality ----
        y = jax.nn.one_hot(label0, cfg.num_classes, dtype=jnp.float32)
        y = y * quality[:, None]
        p = jax.nn.sigmoid(logits)
        qfl = jnp.abs(y - p) ** cfg.qfl_beta * optax_sigmoid_ce(logits, y)
        loss_qfl = jnp.sum(qfl) / num_pos

        # ---- re-weighting: detached max class prob at positives ----
        w = jnp.where(pos, jax.lax.stop_gradient(jnp.max(p, -1)), 0.0)
        w_sum = jnp.maximum(jnp.sum(w), 1e-6)

        # ---- GIoU on decoded boxes (scale-invariant; image coords) ----
        loss_giou = iou_loss(boxes, matched, weight=w, mode="giou", avg_factor=w_sum)

        # ---- DFL on the two bins bracketing the target distance ----
        tl_d = jnp.stack(
            [cx - matched[:, 0], cy - matched[:, 1],
             matched[:, 2] - cx, matched[:, 3] - cy], -1,
        ) / strides[:, None]
        t = jnp.clip(tl_d, 0.0, cfg.reg_max - 1e-4)  # (N, 4)
        t_lo = jnp.floor(t)
        w_hi = t - t_lo
        w_lo = 1.0 - w_hi
        logp = jax.nn.log_softmax(
            fr[i].reshape(-1, 4, n1).astype(jnp.float32), axis=-1
        )
        # one-hot contraction, not take_along_axis (gather rule, see header)
        oh_lo = (bins[None, None] == t_lo[..., None]).astype(jnp.float32)
        oh_hi = (bins[None, None] == (t_lo + 1.0)[..., None]).astype(jnp.float32)
        ce = -(w_lo * jnp.sum(oh_lo * logp, -1) + w_hi * jnp.sum(oh_hi * logp, -1))
        loss_dfl = jnp.sum(w[:, None] * ce) / (4.0 * w_sum)

        return loss_qfl, loss_giou, loss_dfl, jnp.sum(pos)

    qfl, giou, dfl, num_pos = jax.vmap(one_image)(jnp.arange(gt_boxes.shape[0]))
    loss_qfl = jnp.mean(qfl) * cfg.qfl_weight
    loss_giou = jnp.mean(giou) * cfg.giou_weight
    loss_dfl = jnp.mean(dfl) * cfg.dfl_weight
    return {
        "loss_qfl": loss_qfl,
        "loss_giou": loss_giou,
        "loss_dfl": loss_dfl,
        "loss": loss_qfl + loss_giou + loss_dfl,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def decode_gfl(
    cfg: GFLConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Per-level preselect -> integral decode -> class-wise NMS."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    level_anchors = cfg.anchor_generator.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]
    n1 = 4 * (cfg.reg_max + 1)
    top_k_fn = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k

    sel_s, sel_c, sel_r, sel_st = [], [], [], []
    for lvl, (s_l, r_l) in enumerate(zip(cls_scores, bbox_preds)):
        # f32 casts before top-k/gather are load-bearing on the TPU runtime
        # (see decode_detections NOTE in single_stage.py)
        s = s_l.reshape(b, -1, cfg.num_classes).astype(jnp.float32)
        r = r_l.reshape(b, -1, n1).astype(jnp.float32)
        anc = level_anchors[lvl]
        centers = jnp.stack(
            [(anc[:, 0] + anc[:, 2]) * 0.5, (anc[:, 1] + anc[:, 3]) * 0.5], -1
        )
        n_l = s.shape[1]
        k = min(cfg.pre_select_per_level, n_l)
        if k < n_l:
            best = jnp.max(s, axis=-1)
            _, idx = top_k_fn(best, k)
            s = jnp.take_along_axis(s, idx[..., None], axis=1)
            r = jnp.take_along_axis(r, idx[..., None], axis=1)
            c = centers[idx]
        else:
            c = jnp.broadcast_to(centers[None], (b, n_l, 2))
        sel_s.append(s)
        sel_c.append(c)
        sel_r.append(r)
        sel_st.append(
            jnp.full(s.shape[:2], float(cfg.anchor_generator.strides[lvl]), jnp.float32)
        )

    scores = jax.nn.sigmoid(jnp.concatenate(sel_s, 1))
    centers = jnp.concatenate(sel_c, 1)
    regs = jnp.concatenate(sel_r, 1)
    strides = jnp.concatenate(sel_st, 1)

    def one_image(i):
        dist = integral(regs[i], cfg.reg_max) * strides[i][:, None]
        boxes = jnp.stack(
            [centers[i, :, 0] - dist[:, 0], centers[i, :, 1] - dist[:, 1],
             centers[i, :, 0] + dist[:, 2], centers[i, :, 1] + dist[:, 3]], -1,
        )
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            x = jnp.clip(boxes[:, 0::2], 0, w - 1.0)
            y = jnp.clip(boxes[:, 1::2], 0, h - 1.0)
            boxes = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        res = multiclass_nms(
            boxes, scores[i],
            iou_thr=cfg.nms_iou_thr, score_thr=cfg.score_thr,
            pre_nms_top_k=cfg.pre_nms_top_k, max_out=cfg.max_detections,
            approx_top_k=cfg.approx_top_k,
        )
        out_boxes = res.boxes
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[i]
        return NMSResult(out_boxes, res.scores, res.labels, res.valid, res.indices)

    return jax.vmap(one_image)(jnp.arange(b))
