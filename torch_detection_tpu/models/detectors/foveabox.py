"""FoveaBox detector: fovea-region targets, focal + log-space smooth-L1, decode.

Anchor-free family #13 over the shared backbone/FPN zoo (reference context:
TCGGroup/Torch_Detection never built any detector tier — SURVEY.md §2 #33).
FoveaBox (Kong et al., "FoveaBox: Beyond Anchor-based Object Detector",
2019) assigns objects to pyramid levels by object SCALE (sqrt-area bands,
overlapping so one gt can train two levels) and marks as positive only the
"fovea" — the sigma-shrunk central region of each box.  Regression is
log-space against a per-level ``base_edge``:

    t = log((p - x1) / base), …   decode: x1 = px - base * exp(t0), …

TPU-first formulation mirrors ``fcos.py``: per-level point grids are
compile-time constants; assignment is one dense masked (N_points, max_gts)
reduction per image with min-area tie-break (the paper paints boxes in
descending-area order, so the smallest wins); per-point selections use the
one-hot contraction forms from ``ops/tpu_gather.py`` (plain gathers at
20k-point scale run ~10x off roofline on TPU).  One documented deviation:
the feature cell containing a matched gt's center is always positive even
when the shrunk fovea is narrower than the cell spacing, guaranteeing >= 1
positive per assigned level without data-dependent shapes (mmdet's
integer ceil/floor windows achieve the same effect through clamping).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.losses import sigmoid_focal_loss_sparse, smooth_l1_loss
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows, take_per_row
from .fcos import level_points

INF = 1e8


@dataclasses.dataclass(frozen=True)
class FoveaConfig:
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    base_edges: Tuple[float, ...] = (16.0, 32.0, 64.0, 128.0, 256.0)
    # per-level sqrt-area bands; overlapping on purpose (one gt may be
    # assigned on two adjacent levels)
    scale_ranges: Tuple[Tuple[float, float], ...] = (
        (1.0, 64.0), (32.0, 128.0), (64.0, 256.0), (128.0, 512.0), (256.0, 2048.0)
    )
    sigma: float = 0.4  # fovea shrink factor
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smooth_l1_beta: float = 0.11
    reg_loss_weight: float = 1.0
    # inference
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    pre_select_per_level: int = 1000
    pre_nms_top_k: int = 1000
    max_detections: int = 100
    approx_top_k: bool = False


def _flat_geometry(cfg: FoveaConfig, featmap_sizes):
    """All-level points (N, 2) + per-point (N,) stride/base + (N, 2) band."""
    pts, strides, bases, bands = [], [], [], []
    for fs, stride, base, band in zip(
        featmap_sizes, cfg.strides, cfg.base_edges, cfg.scale_ranges
    ):
        p = level_points(fs, stride)
        n = p.shape[0]
        pts.append(p)
        strides.append(jnp.full((n,), float(stride), jnp.float32))
        bases.append(jnp.full((n,), float(base), jnp.float32))
        bands.append(jnp.broadcast_to(jnp.asarray(band, jnp.float32)[None], (n, 2)))
    return (
        jnp.concatenate(pts, 0),
        jnp.concatenate(strides, 0),
        jnp.concatenate(bases, 0),
        jnp.concatenate(bands, 0),
    )


def fovea_targets(
    cfg: FoveaConfig,
    points: jnp.ndarray,   # (N, 2)
    strides: jnp.ndarray,  # (N,)
    bases: jnp.ndarray,    # (N,)
    bands: jnp.ndarray,    # (N, 2)
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,) 1-based
    gt_valid: jnp.ndarray,  # (G,) bool
):
    """Per-point (label0 [-1 = bg], 4 log-space targets)."""
    x = points[:, 0][:, None]  # (N, 1)
    y = points[:, 1][:, None]
    x1, y1, x2, y2 = (gt_boxes[:, i][None, :] for i in range(4))  # (1, G)
    w = x2 - x1
    h = y2 - y1
    cx = 0.5 * (x1 + x2)
    cy = 0.5 * (y1 + y2)
    # level routing: sqrt-area inside the per-point band
    scale = jnp.sqrt(jnp.maximum(w * h, 0.0))  # (1, G)
    in_band = (scale >= bands[:, 0][:, None]) & (scale <= bands[:, 1][:, None])
    # fovea: point center inside the sigma-shrunk box …
    half_w = 0.5 * cfg.sigma * w
    half_h = 0.5 * cfg.sigma * h
    in_fovea = (jnp.abs(x - cx) <= half_w) & (jnp.abs(y - cy) <= half_h)
    # … or this is the cell containing the gt center (>= 1 positive per
    # assigned level even when the fovea is narrower than the cell pitch)
    half_cell = 0.5 * strides[:, None]
    center_cell = (jnp.abs(x - cx) <= half_cell) & (jnp.abs(y - cy) <= half_cell)
    # targets must stay finite: the point must be strictly inside the box
    inside = (x > x1) & (x < x2) & (y > y1) & (y < y2)
    cand = in_band & (in_fovea | center_cell) & inside & gt_valid[None, :]
    areas = w[0] * h[0]  # (G,)
    masked_areas = jnp.where(cand, areas[None, :], INF)
    gi = jnp.argmin(masked_areas, axis=-1)  # (N,)
    has = take_per_row(cand, gi)
    label0 = jnp.where(has, gather_rows(gt_labels, gi) - 1, -1).astype(jnp.int32)
    g = gather_rows(gt_boxes, gi)  # (N, 4)
    px, py = points[:, 0], points[:, 1]
    ratios = jnp.stack(
        [px - g[:, 0], py - g[:, 1], g[:, 2] - px, g[:, 3] - py], axis=-1
    ) / bases[:, None]
    tgt = jnp.log(jnp.clip(ratios, 1.0 / 16.0, 16.0))
    return label0, tgt


def _flatten(cfg, cls_scores, bbox_preds):
    b = cls_scores[0].shape[0]
    fc = jnp.concatenate([s.reshape(b, -1, cfg.num_classes) for s in cls_scores], 1)
    fr = jnp.concatenate([r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds], 1)
    return fc, fr


def fovea_loss(
    cfg: FoveaConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
) -> Dict[str, jax.Array]:
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    points, strides, bases, bands = _flat_geometry(cfg, featmap_sizes)
    fc, fr = _flatten(cfg, cls_scores, bbox_preds)

    def one_image(i):
        label0, tgt = fovea_targets(
            cfg, points, strides, bases, bands,
            gt_boxes[i], gt_labels[i], gt_valid[i],
        )
        pos = label0 >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        cls_l = sigmoid_focal_loss_sparse(
            fc[i], label0, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
            avg_factor=num_pos,
        )
        reg_l = smooth_l1_loss(
            fr[i], tgt, weight=pos.astype(jnp.float32)[:, None],
            beta=cfg.smooth_l1_beta, avg_factor=num_pos * 4.0,
        )
        return cls_l, reg_l, jnp.sum(pos)

    cls_l, reg_l, num_pos = jax.vmap(one_image)(jnp.arange(gt_boxes.shape[0]))
    loss_cls = jnp.mean(cls_l)
    loss_reg = cfg.reg_loss_weight * jnp.mean(reg_l)
    return {
        "loss_cls": loss_cls,
        "loss_reg": loss_reg,
        "loss": loss_cls + loss_reg,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def decode_fovea(
    cfg: FoveaConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Per-level preselect -> base_edge * exp decode -> class-wise NMS."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    b = cls_scores[0].shape[0]
    top_k_fn = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k

    sel_s, sel_p, sel_r, sel_base = [], [], [], []
    for fs, stride, base, s_l, r_l in zip(
        featmap_sizes, cfg.strides, cfg.base_edges, cls_scores, bbox_preds
    ):
        pts = level_points(fs, stride)
        s = s_l.reshape(b, -1, cfg.num_classes).astype(jnp.float32)
        r = r_l.reshape(b, -1, 4).astype(jnp.float32)
        n_l = s.shape[1]
        k = min(cfg.pre_select_per_level, n_l)
        if k < n_l:
            best = jnp.max(s, axis=-1)
            _, idx = top_k_fn(best, k)
            s = jnp.take_along_axis(s, idx[..., None], axis=1)
            r = jnp.take_along_axis(r, idx[..., None], axis=1)
            p = pts[idx]
        else:
            p = jnp.broadcast_to(pts[None], (b, n_l, 2))
        sel_s.append(s)
        sel_p.append(p)
        sel_r.append(r)
        sel_base.append(jnp.full((b, s.shape[1]), float(base), jnp.float32))

    scores = jax.nn.sigmoid(jnp.concatenate(sel_s, 1))
    pts = jnp.concatenate(sel_p, 1)
    regs = jnp.concatenate(sel_r, 1)
    base = jnp.concatenate(sel_base, 1)

    def one_image(i):
        dist = base[i][:, None] * jnp.exp(regs[i])  # (N, 4)
        boxes = jnp.stack(
            [pts[i, :, 0] - dist[:, 0], pts[i, :, 1] - dist[:, 1],
             pts[i, :, 0] + dist[:, 2], pts[i, :, 1] + dist[:, 3]], -1,
        )
        if img_shapes is not None:
            hh, ww = img_shapes[i, 0], img_shapes[i, 1]
            xx = jnp.clip(boxes[:, 0::2], 0, ww - 1.0)
            yy = jnp.clip(boxes[:, 1::2], 0, hh - 1.0)
            boxes = jnp.stack([xx[:, 0], yy[:, 0], xx[:, 1], yy[:, 1]], axis=-1)
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
