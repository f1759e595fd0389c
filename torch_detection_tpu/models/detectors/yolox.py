"""YOLOX: anchor-free decoupled-head detector with SimOTA assignment.

Ge et al., "YOLOX: Exceeding YOLO Series in 2021" — the nineteenth family.
Reference context: TCGGroup/Torch_Detection's YOLO lineage stops at the
backbone zoo (no detector tier, SURVEY.md §2 #33); this adds the
industrial-standard successor to YOLOv3 with its dynamic label assignment.

TPU-first formulation of SimOTA (everything fixed-shape, assignment under
``stop_gradient`` like the official ``get_assignments`` no-grad block):
* the (N, G) class-BCE cost matrix is built WITHOUT the (N, G, C) tensor:
  ``sum_c BCE(p_c, onehot_g)`` decomposes into a per-anchor term
  ``S_n = sum_c -log(1-p_c)`` plus a per-(anchor, gt) correction that only
  needs ``p[n, label_g]`` — one (N, C) @ (C, G) one-hot matmul.
* dynamic-k is bounded by 10 (k_g = clamp(sum of top-10 candidate IoUs)),
  so "select the k_g cheapest anchors per gt" is a top-k(10) over the cost
  row + a compare against the k_g-th smallest — no per-gt dynamic shapes,
  no full argsort ranks.
* anchor conflicts resolve by min-cost gt (masked argmin), matching the
  official tie rule.

The official mosaic/mixup augmentation schedule is a data-tier concern and
is not bundled here (standard transforms apply); the L1 fine-tune-phase
loss is exposed as ``use_l1``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.boxes import bbox_overlaps
from ...ops.losses import iou_loss
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows, take_per_row

INF = 1e8
BIG = 1e5


@dataclasses.dataclass(frozen=True)
class YOLOXConfig:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32)
    center_radius: float = 2.5  # center-prior radius in stride units
    candidate_topk: int = 10  # dynamic-k pool (k_g <= this)
    iou_cost_weight: float = 3.0
    reg_loss_weight: float = 5.0
    use_l1: bool = False  # official fine-tune-phase extra L1 on raw preds
    # inference
    score_thr: float = 0.01
    nms_iou_thr: float = 0.65
    pre_nms_top_k: int = 1000
    max_detections: int = 100
    approx_top_k: bool = False


def _flat_grid(cfg: YOLOXConfig, featmap_sizes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-level (N, 2) cell corners (grid units * stride) + (N,) strides."""
    pts, sts = [], []
    for (h, w), s in zip(featmap_sizes, cfg.strides):
        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        px = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
        py = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
        pts.append(jnp.stack([px, py], -1) * s)
        sts.append(jnp.full((h * w,), float(s), jnp.float32))
    return jnp.concatenate(pts, 0), jnp.concatenate(sts, 0)


def _decode_boxes(reg: jnp.ndarray, grid: jnp.ndarray, stride: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) raw preds -> xyxy: cxy = (offset*stride + corner), wh = exp*stride."""
    cxy = reg[:, :2] * stride[:, None] + grid
    wh = jnp.exp(jnp.clip(reg[:, 2:], -10.0, 8.0)) * stride[:, None]
    return jnp.concatenate([cxy - wh / 2.0, cxy + wh / 2.0], axis=-1)


def _flatten3(cfg, cls_scores, bbox_preds, objectnesses):
    b = cls_scores[0].shape[0]
    fc = jnp.concatenate(
        [s.reshape(b, -1, cfg.num_classes).astype(jnp.float32) for s in cls_scores], 1)
    fr = jnp.concatenate(
        [r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds], 1)
    fo = jnp.concatenate(
        [o.reshape(b, -1).astype(jnp.float32) for o in objectnesses], 1)
    return fc, fr, fo


def simota_assign(
    cfg: YOLOXConfig,
    cls_logits: jnp.ndarray,  # (N, C) f32
    obj_logits: jnp.ndarray,  # (N,) f32
    boxes: jnp.ndarray,  # (N, 4) decoded xyxy
    grid: jnp.ndarray,  # (N, 2) cell corners (image coords)
    strides: jnp.ndarray,  # (N,)
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,) 1-based
    gt_valid: jnp.ndarray,  # (G,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SimOTA -> (fg (N,), matched gt idx (N,), matched pred iou (N,))."""
    centers = grid + 0.5 * strides[:, None]  # prior centers
    x, y = centers[:, 0][:, None], centers[:, 1][:, None]
    in_box = (
        (x > gt_boxes[None, :, 0]) & (x < gt_boxes[None, :, 2])
        & (y > gt_boxes[None, :, 1]) & (y < gt_boxes[None, :, 3])
    )  # (N, G)
    gcx = 0.5 * (gt_boxes[:, 0] + gt_boxes[:, 2])
    gcy = 0.5 * (gt_boxes[:, 1] + gt_boxes[:, 3])
    r = cfg.center_radius * strides[:, None]
    in_center = (
        (jnp.abs(x - gcx[None, :]) < r) & (jnp.abs(y - gcy[None, :]) < r)
    )
    cand = (in_box | in_center) & gt_valid[None, :]
    both = in_box & in_center

    iou = bbox_overlaps(boxes, gt_boxes, offset=0.0)  # (N, G)
    iou_cost = -jnp.log(iou + 1e-8)
    # class BCE cost without the (N, G, C) tensor (module docstring)
    p = jnp.sqrt(
        jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits)[:, None]
    )  # (N, C) — the official sqrt(cls * obj) joint score
    p = jnp.clip(p, 1e-8, 1.0 - 1e-8)
    s_all = jnp.sum(-jnp.log1p(-p), axis=-1)  # (N,)
    label0 = jnp.clip(gt_labels - 1, 0, cls_logits.shape[-1] - 1)
    onehot = (label0[None, :] == jnp.arange(cls_logits.shape[-1])[:, None])
    p_sel = p @ onehot.astype(jnp.float32)  # (N, G): p[n, label_g]
    cls_cost = s_all[:, None] - jnp.log(p_sel) + jnp.log1p(-p_sel)

    cost = (
        cls_cost + cfg.iou_cost_weight * iou_cost
        + BIG * (~both).astype(jnp.float32)
    )
    cost = jnp.where(cand, cost, INF)

    # dynamic k: sum of the top-10 candidate IoUs per gt, clamped >= 1
    iou_cand = jnp.where(cand, iou, 0.0)
    topk_iou, _ = jax.lax.top_k(iou_cand.T, cfg.candidate_topk)  # (G, k)
    k_g = jnp.clip(jnp.sum(topk_iou, axis=-1).astype(jnp.int32), 1,
                   cfg.candidate_topk)
    # the k_g-th smallest cost per gt (k_g <= candidate_topk by clamp)
    smallest, _ = jax.lax.top_k(-cost.T, cfg.candidate_topk)  # (G, k) ascending cost
    kth = take_per_row(-smallest, k_g - 1)  # (G,)
    selected = cand & (cost <= kth[None, :])

    # conflicts: min-cost gt wins (official tie rule)
    sel_cost = jnp.where(selected, cost, INF)
    matched = jnp.argmin(sel_cost, axis=-1)  # (N,)
    fg = jnp.any(selected, axis=-1)
    matched_iou = take_per_row(iou, matched)
    return fg, matched.astype(jnp.int32), matched_iou


def yolox_loss(
    cfg: YOLOXConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    objectnesses: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
) -> Dict[str, jax.Array]:
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    grid, strides = _flat_grid(cfg, featmap_sizes)
    fc, fr, fo = _flatten3(cfg, cls_scores, bbox_preds, objectnesses)

    def one_image(i):
        boxes = _decode_boxes(fr[i], grid, strides)
        fg, matched, m_iou = simota_assign(
            cfg,
            jax.lax.stop_gradient(fc[i]), jax.lax.stop_gradient(fo[i]),
            jax.lax.stop_gradient(boxes), grid, strides,
            gt_boxes[i], gt_labels[i], gt_valid[i],
        )
        num_fg = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
        w_fg = fg.astype(jnp.float32)

        obj_l = jnp.sum(
            _bce(fo[i], fg.astype(jnp.float32))
        ) / num_fg

        label0 = jnp.clip(gather_rows(gt_labels[i], matched) - 1, 0,
                          cfg.num_classes - 1)
        cls_t = (
            (label0[:, None] == jnp.arange(cfg.num_classes)[None, :])
            .astype(jnp.float32) * jax.lax.stop_gradient(m_iou)[:, None]
        )
        cls_l = jnp.sum(
            _bce(fc[i], cls_t) * w_fg[:, None]
        ) / num_fg

        tgt_boxes = gather_rows(gt_boxes[i], matched)
        reg_l = iou_loss(
            boxes, tgt_boxes, weight=w_fg, mode="square_iou", offset=0.0,
            avg_factor=num_fg,
        ) * cfg.reg_loss_weight
        if cfg.use_l1:
            # official fine-tune phase: L1 on the raw reg parameterization
            t_cxy = (0.5 * (tgt_boxes[:, :2] + tgt_boxes[:, 2:]) - grid) / strides[:, None]
            t_wh = jnp.log(
                jnp.maximum(tgt_boxes[:, 2:] - tgt_boxes[:, :2], 1e-3)
                / strides[:, None]
            )
            l1 = jnp.sum(
                jnp.abs(fr[i] - jnp.concatenate([t_cxy, t_wh], -1))
                * w_fg[:, None]
            ) / num_fg
            reg_l = reg_l + l1
        return cls_l, reg_l, obj_l, jnp.sum(fg)

    cls_l, reg_l, obj_l, num_fg = jax.vmap(one_image)(jnp.arange(gt_boxes.shape[0]))
    loss_cls = jnp.mean(cls_l)
    loss_reg = jnp.mean(reg_l)
    loss_obj = jnp.mean(obj_l)
    return {
        "loss_cls": loss_cls,
        "loss_reg": loss_reg,
        "loss_obj": loss_obj,
        "loss": loss_cls + loss_reg + loss_obj,
        "num_pos": jnp.mean(num_fg.astype(jnp.float32)),
    }


def _bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise sigmoid BCE (no reduction)."""
    return jnp.clip(logits, 0, None) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def decode_yolox(
    cfg: YOLOXConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    objectnesses: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """sigmoid(cls) * sigmoid(obj) scores -> grid decode -> class-wise NMS."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    grid, strides = _flat_grid(cfg, featmap_sizes)
    fc, fr, fo = _flatten3(cfg, cls_scores, bbox_preds, objectnesses)
    scores_all = jax.nn.sigmoid(fc) * jax.nn.sigmoid(fo)[..., None]

    def one_image(i):
        boxes = _decode_boxes(fr[i], grid, strides)
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            xs = jnp.clip(boxes[:, 0::2], 0, w - 1.0)
            ys = jnp.clip(boxes[:, 1::2], 0, h - 1.0)
            boxes = jnp.stack([xs[:, 0], ys[:, 0], xs[:, 1], ys[:, 1]], -1)
        res = multiclass_nms(
            boxes, scores_all[i],
            iou_thr=cfg.nms_iou_thr, score_thr=cfg.score_thr,
            pre_nms_top_k=cfg.pre_nms_top_k, max_out=cfg.max_detections,
            approx_top_k=cfg.approx_top_k,
        )
        out_boxes = res.boxes
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[i]
        return NMSResult(out_boxes, res.scores, res.labels, res.valid, res.indices)

    return jax.vmap(one_image)(jnp.arange(fc.shape[0]))
