"""FCOS detector: point targets, focal+IoU+centerness loss, decode.

Anchor-free family over the shared backbone/FPN zoo (reference context:
TCGGroup/Torch_Detection never built any detector tier — SURVEY.md §2 #33).
TPU-first formulation: per-level point grids are compile-time constants;
target assignment is one dense masked reduction per image — each point
picks the minimum-area ground-truth box that contains it within the
level's regression range (the FCOS rule) via a masked argmin over the
fixed (N_points, max_gts) matrix; no dynamic shapes anywhere.

Uses the detector's SingleStageDetector assembly (3-output head) with its
own loss/decode pair, sharing delta-free ltrb geometry, the sparse focal
loss, and the class-offset NMS.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.losses import (
    binary_cross_entropy,
    iou_loss,
    sigmoid_focal_loss_sparse,
)
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows, take_per_row

INF = 1e8


@dataclasses.dataclass(frozen=True)
class FCOSConfig:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    # per-level max-ltrb regression ranges (the FCOS level assignment rule)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1.0, 64.0), (64.0, 128.0), (128.0, 256.0), (256.0, 512.0), (512.0, INF)
    )
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # inference
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    pre_select_per_level: int = 1000
    pre_nms_top_k: int = 1000
    max_detections: int = 100
    approx_top_k: bool = False


def level_points(featmap_size: Tuple[int, int], stride: int) -> jnp.ndarray:
    """(H*W, 2) point centers (x, y) at (i + 0.5) * stride."""
    h, w = featmap_size
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
    px = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
    py = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
    return jnp.stack([px, py], axis=-1)


def _flat_points(cfg: FCOSConfig, featmap_sizes) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-level points (N, 2) + per-point (N, 2) regress range."""
    pts, rngs = [], []
    for fs, stride, rr in zip(featmap_sizes, cfg.strides, cfg.regress_ranges):
        p = level_points(fs, stride)
        pts.append(p)
        rngs.append(jnp.broadcast_to(jnp.asarray(rr, jnp.float32)[None], (p.shape[0], 2)))
    return jnp.concatenate(pts, 0), jnp.concatenate(rngs, 0)


def fcos_targets(
    cfg: FCOSConfig,
    points: jnp.ndarray,  # (N, 2)
    ranges: jnp.ndarray,  # (N, 2)
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,) 1-based
    gt_valid: jnp.ndarray,  # (G,) bool
):
    """Per-point (label0 [-1 = bg], ltrb target, centerness target)."""
    x = points[:, 0][:, None]  # (N, 1)
    y = points[:, 1][:, None]
    l = x - gt_boxes[None, :, 0]  # (N, G)
    t = y - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - x
    b = gt_boxes[None, :, 3] - y
    ltrb = jnp.stack([l, t, r, b], axis=-1)  # (N, G, 4)
    inside = jnp.min(ltrb, axis=-1) > 0.0
    max_dist = jnp.max(ltrb, axis=-1)
    in_range = (max_dist >= ranges[:, 0][:, None]) & (max_dist <= ranges[:, 1][:, None])
    areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    cand = inside & in_range & gt_valid[None, :]
    masked_areas = jnp.where(cand, areas[None, :], INF)
    gi = jnp.argmin(masked_areas, axis=-1)  # (N,)
    # one-hot selections, not take_along_axis/gather: TPU gathers at point
    # scale (N ~ 20k-180k rows) run ~10x off roofline (see ops/tpu_gather.py)
    has = take_per_row(cand, gi)
    label0 = jnp.where(has, gather_rows(gt_labels, gi) - 1, -1).astype(jnp.int32)
    tgt = take_per_row(ltrb, gi)  # (N, 4)
    lr = jnp.stack([tgt[:, 0], tgt[:, 2]], -1)
    tb = jnp.stack([tgt[:, 1], tgt[:, 3]], -1)
    eps = 1e-6
    ctr = jnp.sqrt(
        jnp.clip(jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), eps), 0, 1)
        * jnp.clip(jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), eps), 0, 1)
    )
    return label0, tgt, jnp.where(has, ctr, 0.0)


def _flatten(cfg, cls_scores, bbox_preds, centernesses):
    b = cls_scores[0].shape[0]
    fc = jnp.concatenate([s.reshape(b, -1, cfg.num_classes) for s in cls_scores], 1)
    fr = jnp.concatenate([r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds], 1)
    fct = jnp.concatenate([c.reshape(b, -1).astype(jnp.float32) for c in centernesses], 1)
    return fc, fr, fct


def fcos_loss(
    cfg: FCOSConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    centernesses: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
) -> Dict[str, jax.Array]:
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    points, ranges = _flat_points(cfg, featmap_sizes)
    fc, fr, fct = _flatten(cfg, cls_scores, bbox_preds, centernesses)

    def one_image(i):
        label0, tgt, ctr_t = fcos_targets(
            cfg, points, ranges, gt_boxes[i], gt_labels[i], gt_valid[i]
        )
        pos = label0 >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        cls_l = sigmoid_focal_loss_sparse(
            fc[i], label0, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
            avg_factor=num_pos,
        )
        dist = jnp.exp(fr[i])  # (N, 4) ltrb
        pred_boxes = jnp.stack(
            [points[:, 0] - dist[:, 0], points[:, 1] - dist[:, 1],
             points[:, 0] + dist[:, 2], points[:, 1] + dist[:, 3]], -1,
        )
        tgt_boxes = jnp.stack(
            [points[:, 0] - tgt[:, 0], points[:, 1] - tgt[:, 1],
             points[:, 0] + tgt[:, 2], points[:, 1] + tgt[:, 3]], -1,
        )
        ctr_sum = jnp.maximum(jnp.sum(jnp.where(pos, ctr_t, 0.0)), 1e-6)
        reg_l = iou_loss(
            pred_boxes, tgt_boxes, weight=jnp.where(pos, ctr_t, 0.0),
            mode="giou", offset=0.0, avg_factor=ctr_sum,
        )
        ctr_l = binary_cross_entropy(
            fct[i], ctr_t, weight=pos.astype(jnp.float32), avg_factor=num_pos
        )
        return cls_l, reg_l, ctr_l, jnp.sum(pos)

    cls_l, reg_l, ctr_l, num_pos = jax.vmap(one_image)(jnp.arange(gt_boxes.shape[0]))
    loss_cls = jnp.mean(cls_l)
    loss_reg = jnp.mean(reg_l)
    loss_ctr = jnp.mean(ctr_l)
    return {
        "loss_cls": loss_cls,
        "loss_reg": loss_reg,
        "loss_centerness": loss_ctr,
        "loss": loss_cls + loss_reg + loss_ctr,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def decode_fcos(
    cfg: FCOSConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    centernesses: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Per-level preselect -> point decode -> centerness-weighted NMS."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    b = cls_scores[0].shape[0]
    top_k_fn = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k

    sel_s, sel_p, sel_r, sel_c = [], [], [], []
    for fs, stride, s_l, r_l, c_l in zip(
        featmap_sizes, cfg.strides, cls_scores, bbox_preds, centernesses
    ):
        pts = level_points(fs, stride)
        s = s_l.reshape(b, -1, cfg.num_classes).astype(jnp.float32)
        r = r_l.reshape(b, -1, 4).astype(jnp.float32)
        c = c_l.reshape(b, -1).astype(jnp.float32)
        n_l = s.shape[1]
        k = min(cfg.pre_select_per_level, n_l)
        if k < n_l:
            best = jnp.max(s, axis=-1)
            _, idx = top_k_fn(best, k)
            s = jnp.take_along_axis(s, idx[..., None], axis=1)
            r = jnp.take_along_axis(r, idx[..., None], axis=1)
            c = jnp.take_along_axis(c, idx, axis=1)
            p = pts[idx]
        else:
            p = jnp.broadcast_to(pts[None], (b, n_l, 2))
        sel_s.append(s)
        sel_p.append(p)
        sel_r.append(r)
        sel_c.append(c)

    scores = jax.nn.sigmoid(jnp.concatenate(sel_s, 1))
    pts = jnp.concatenate(sel_p, 1)
    regs = jnp.concatenate(sel_r, 1)
    ctr = jax.nn.sigmoid(jnp.concatenate(sel_c, 1))

    def one_image(i):
        dist = jnp.exp(regs[i])
        boxes = jnp.stack(
            [pts[i, :, 0] - dist[:, 0], pts[i, :, 1] - dist[:, 1],
             pts[i, :, 0] + dist[:, 2], pts[i, :, 1] + dist[:, 3]], -1,
        )
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            x = jnp.clip(boxes[:, 0::2], 0, w - 1.0)
            y = jnp.clip(boxes[:, 1::2], 0, h - 1.0)
            boxes = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        weighted = scores[i] * ctr[i][:, None]
        res = multiclass_nms(
            boxes, weighted,
            iou_thr=cfg.nms_iou_thr, score_thr=cfg.score_thr,
            pre_nms_top_k=cfg.pre_nms_top_k, max_out=cfg.max_detections,
            approx_top_k=cfg.approx_top_k,
        )
        out_boxes = res.boxes
        if scale_factors is not None:
            out_boxes = out_boxes / scale_factors[i]
        return NMSResult(out_boxes, res.scores, res.labels, res.valid, res.indices)

    return jax.vmap(one_image)(jnp.arange(b))
