"""CenterNet: NMS-free keypoint-style detection ("Objects as Points").

Tenth detector family; a paradigm the reference never had (its model tier
is empty — SURVEY.md §2 #33) and a deliberately TPU-friendly one: no
anchors, no NMS — inference is one dense sigmoid + a 3x3 max-pool
peak-pick + a single top-k, all static-shape, nothing sequential.

TPU-first formulation of the training targets: instead of the host-side
per-object numpy window splat of the original, the per-class Gaussian
heatmap is built ON DEVICE by a ``lax.scan`` over the fixed gt slate — each
step max-folds one object's full-map Gaussian (masked to its Chebyshev
radius window, so numerics match the classic bounded splat exactly) into
the (H, W, C) target via a one-hot class outer product.  ~1.3 M f32 per
step at the 128x128 COCO map: trivially fused by XLA, no dynamic shapes,
differentiable-free (targets are stop-gradient by construction).

Geometry notes (repo conventions): boxes are xyxy inclusive (+1 pixel);
centers/sizes convert to feature units through ``down_ratio``; the
``gaussian_radius`` is the corrected CornerNet quadratic ((b - sqrt) / 2a
roots, not the original's halved form).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.nms import NMSResult


@dataclasses.dataclass(frozen=True)
class CenterNetConfig:
    num_classes: int = 80
    down_ratio: int = 4
    min_overlap: float = 0.3  # Gaussian-radius IoU bound
    heat_weight: float = 1.0
    wh_weight: float = 0.1
    off_weight: float = 1.0
    # inference
    score_thr: float = 0.05
    max_detections: int = 100
    # kept for evaluator/TTA plumbing compatibility (fused flip merging);
    # CenterNet itself runs NMS-free
    nms_iou_thr: float = 0.5


def gaussian_radius(h: jax.Array, w: jax.Array, min_overlap: float) -> jax.Array:
    """Radius such that any center within it keeps IoU >= min_overlap with
    the (h, w) box — elementwise over arrays; corrected quadratic roots."""
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1.0 - min_overlap) / (1.0 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 * b1 - 4.0 * a1 * c1, 0.0))
    r1 = (b1 - sq1) / (2.0 * a1)

    a2 = 4.0
    b2 = 2.0 * (h + w)
    c2 = (1.0 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2 * b2 - 4.0 * a2 * c2, 0.0))
    r2 = (b2 - sq2) / (2.0 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (h + w)
    c3 = (min_overlap - 1.0) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3 * b3 - 4.0 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2.0 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def centernet_targets(
    cfg: CenterNetConfig,
    featmap_size: Tuple[int, int],
    gt_boxes: jax.Array,  # (G, 4) xyxy image coords
    gt_labels: jax.Array,  # (G,) int32 1-based
    gt_valid: jax.Array,  # (G,) bool
):
    """-> heat (H, W, C), wh_t (G, 2), off_t (G, 2), ind (G,), mask (G,)."""
    hh, ww = featmap_size
    dr = float(cfg.down_ratio)
    c = cfg.num_classes

    w_f = (gt_boxes[:, 2] - gt_boxes[:, 0] + 1.0) / dr
    h_f = (gt_boxes[:, 3] - gt_boxes[:, 1] + 1.0) / dr
    cx_f = 0.5 * (gt_boxes[:, 0] + gt_boxes[:, 2]) / dr
    cy_f = 0.5 * (gt_boxes[:, 1] + gt_boxes[:, 3]) / dr
    mask = gt_valid & (w_f > 0) & (h_f > 0)

    cx_i = jnp.clip(jnp.floor(cx_f), 0, ww - 1).astype(jnp.int32)
    cy_i = jnp.clip(jnp.floor(cy_f), 0, hh - 1).astype(jnp.int32)
    radius = jnp.floor(jnp.maximum(gaussian_radius(h_f, w_f, cfg.min_overlap), 0.0))
    sigma = (2.0 * radius + 1.0) / 6.0

    xs = jnp.arange(ww, dtype=jnp.float32)
    ys = jnp.arange(hh, dtype=jnp.float32)
    onehot = jax.nn.one_hot(gt_labels - 1, c, dtype=jnp.float32)  # (G, C)

    def fold(heat, g):
        dx = xs - cx_i[g].astype(jnp.float32)  # (W,)
        dy = ys - cy_i[g].astype(jnp.float32)  # (H,)
        g2d = jnp.exp(
            -(dx[None, :] ** 2 + dy[:, None] ** 2) / (2.0 * sigma[g] ** 2 + 1e-12)
        )
        window = (jnp.abs(dx)[None, :] <= radius[g]) & (jnp.abs(dy)[:, None] <= radius[g])
        contrib = jnp.where(window & mask[g], g2d, 0.0)  # (H, W)
        heat = jnp.maximum(heat, contrib[:, :, None] * onehot[g][None, None, :])
        return heat, None

    heat, _ = jax.lax.scan(
        fold, jnp.zeros((hh, ww, c), jnp.float32), jnp.arange(gt_boxes.shape[0])
    )

    ind = cy_i * ww + cx_i
    wh_t = jnp.stack([w_f, h_f], axis=-1)
    off_t = jnp.stack([cx_f - cx_i, cy_f - cy_i], axis=-1)
    return heat, wh_t, off_t, ind, mask


def centernet_loss(
    cfg: CenterNetConfig,
    heat_pred: jax.Array,  # (B, H, W, C) raw logits
    wh_pred: jax.Array,  # (B, H, W, 2)
    off_pred: jax.Array,  # (B, H, W, 2)
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
) -> Dict[str, jax.Array]:
    b, hh, ww, c = heat_pred.shape
    fs = (hh, ww)

    heat_t, wh_t, off_t, ind, mask = jax.vmap(
        lambda bx, lb, vd: centernet_targets(cfg, fs, bx, lb, vd)
    )(gt_boxes, gt_labels, gt_valid)

    p = jax.nn.sigmoid(heat_pred.astype(jnp.float32))
    p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
    pos = heat_t >= 1.0 - 1e-6  # exact 1.0 at valid centers
    num_pos = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)

    # penalty-reduced focal (alpha=2, beta=4)
    pos_loss = jnp.where(pos, -((1.0 - p) ** 2) * jnp.log(p), 0.0)
    neg_loss = jnp.where(
        pos, 0.0, -((1.0 - heat_t) ** 4) * (p ** 2) * jnp.log(1.0 - p)
    )
    loss_heat = (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / num_pos

    wh_flat = wh_pred.reshape(b, hh * ww, 2).astype(jnp.float32)
    off_flat = off_pred.reshape(b, hh * ww, 2).astype(jnp.float32)
    wh_g = jnp.take_along_axis(wh_flat, ind[..., None], axis=1)  # (B, G, 2)
    off_g = jnp.take_along_axis(off_flat, ind[..., None], axis=1)
    w = mask.astype(jnp.float32)[..., None]
    loss_wh = jnp.sum(jnp.abs(wh_g - wh_t) * w) / (num_pos * 2.0)
    loss_off = jnp.sum(jnp.abs(off_g - off_t) * w) / (num_pos * 2.0)

    total = (
        cfg.heat_weight * loss_heat
        + cfg.wh_weight * loss_wh
        + cfg.off_weight * loss_off
    )
    return {
        "loss": total,
        "loss_heatmap": loss_heat,
        "loss_wh": loss_wh,
        "loss_offset": loss_off,
        "num_pos": num_pos / b,
    }


def decode_centernet(
    cfg: CenterNetConfig,
    heat_pred: jax.Array,  # (B, H, W, C) raw logits
    wh_pred: jax.Array,
    off_pred: jax.Array,
    img_shapes: Optional[jax.Array] = None,  # (B, 2)
    scale_factors: Optional[jax.Array] = None,  # (B,)
) -> NMSResult:
    """3x3 local-max peak pick + top-k; no NMS.  f32 casts before the pool
    and gathers are load-bearing on TPU (see CLAUDE.md bf16+gather fault)."""
    b, hh, ww, c = heat_pred.shape
    dr = float(cfg.down_ratio)

    p = jax.nn.sigmoid(heat_pred.astype(jnp.float32))
    pooled = nn.max_pool(p, (3, 3), strides=(1, 1), padding="SAME")
    p = jnp.where(p == pooled, p, 0.0)

    scores_flat = p.reshape(b, hh * ww * c)
    k = min(cfg.max_detections, hh * ww * c)
    scores, idx = jax.lax.top_k(scores_flat, k)
    cls = (idx % c).astype(jnp.int32)
    cell = idx // c
    cx = (cell % ww).astype(jnp.float32)
    cy = (cell // ww).astype(jnp.float32)

    wh_flat = wh_pred.reshape(b, hh * ww, 2).astype(jnp.float32)
    off_flat = off_pred.reshape(b, hh * ww, 2).astype(jnp.float32)
    wh_g = jnp.take_along_axis(wh_flat, cell[..., None], axis=1)  # (B, k, 2)
    off_g = jnp.take_along_axis(off_flat, cell[..., None], axis=1)

    cx_img = (cx + off_g[..., 0]) * dr
    cy_img = (cy + off_g[..., 1]) * dr
    w_img = wh_g[..., 0] * dr
    h_img = wh_g[..., 1] * dr
    x1 = cx_img - 0.5 * (w_img - 1.0)
    y1 = cy_img - 0.5 * (h_img - 1.0)
    x2 = x1 + w_img - 1.0
    y2 = y1 + h_img - 1.0
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    if img_shapes is not None:
        hwm = img_shapes.astype(jnp.float32)
        bx = jnp.clip(boxes[..., 0::2], 0, hwm[:, None, 1:2] - 1.0)
        by = jnp.clip(boxes[..., 1::2], 0, hwm[:, None, 0:1] - 1.0)
        boxes = jnp.stack([bx[..., 0], by[..., 0], bx[..., 1], by[..., 1]], axis=-1)
    if scale_factors is not None:
        boxes = boxes / scale_factors[:, None, None]

    valid = scores > cfg.score_thr
    labels = jnp.where(valid, cls, -1)
    return NMSResult(boxes, scores, labels, valid, cell.astype(jnp.int32))
