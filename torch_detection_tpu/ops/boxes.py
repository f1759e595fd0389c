"""On-device box geometry: pairwise IoU and delta encode/decode (pure jnp).

Fills SURVEY.md §2 #32 ([ABSENT -> must build] in the reference; the mean/std
hooks exist at reference ``datasets/utils/bbox.py:118-166``).  Everything is
fixed-shape and mask-driven: padded gt rows are handled by validity masks, not
by dynamic filtering.

TPU notes: the (N, G) IoU matrix is pure broadcasted elementwise work on the
VPU; XLA fuses the whole overlap computation into one kernel.  For the NxN
case inside NMS see ``ops/nms.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def bbox_areas(boxes: jnp.ndarray, offset: float = 1.0) -> jnp.ndarray:
    """Areas of xyxy boxes; ``offset=1`` is the inclusive-pixel convention the
    reference uses throughout (``bbox.py:39`` xywh->xyxy with -1)."""
    return (boxes[..., 2] - boxes[..., 0] + offset) * (boxes[..., 3] - boxes[..., 1] + offset)


def bbox_overlaps(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    mode: str = "iou",
    offset: float = 1.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Pairwise overlaps between (N, 4) and (G, 4) xyxy boxes -> (N, G).

    ``mode='iou'``: intersection over union; ``'iof'``: intersection over the
    first box's area (used for ignore regions).
    """
    assert mode in ("iou", "iof")
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.clip(rb - lt + offset, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area1 = bbox_areas(boxes1, offset)
    if mode == "iof":
        union = area1[..., :, None]
    else:
        area2 = bbox_areas(boxes2, offset)
        union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / jnp.maximum(union, eps)


def bbox2delta(
    proposals: jnp.ndarray,
    gt: jnp.ndarray,
    means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
    stds: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    offset: float = 1.0,
) -> jnp.ndarray:
    """Encode gt boxes as (dx, dy, dw, dh) deltas relative to proposals,
    normalized by (means, stds) — the reference's ``bbox_normalize`` hook."""
    pw = proposals[..., 2] - proposals[..., 0] + offset
    ph = proposals[..., 3] - proposals[..., 1] + offset
    px = proposals[..., 0] + 0.5 * (pw - offset)
    py = proposals[..., 1] + 0.5 * (ph - offset)

    gw = gt[..., 2] - gt[..., 0] + offset
    gh = gt[..., 3] - gt[..., 1] + offset
    gx = gt[..., 0] + 0.5 * (gw - offset)
    gy = gt[..., 1] + 0.5 * (gh - offset)

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(
    rois: jnp.ndarray,
    deltas: jnp.ndarray,
    means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
    stds: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
    max_shape: Optional[Tuple[int, int]] = None,
    wh_ratio_clip: float = 16.0 / 1000.0,
    offset: float = 1.0,
) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas back to xyxy boxes.

    ``deltas`` may be (..., 4) or class-specific (..., 4C) (reference
    ``bbox_denormalize`` supports A x 4C, ``bbox.py:143-166``).  ``max_shape``
    clips to the image; ``wh_ratio_clip`` bounds exp() blowup.
    """
    means = jnp.tile(jnp.asarray(means, deltas.dtype), deltas.shape[-1] // 4)
    stds = jnp.tile(jnp.asarray(stds, deltas.dtype), deltas.shape[-1] // 4)
    d = deltas * stds + means

    dx = d[..., 0::4]
    dy = d[..., 1::4]
    dw = d[..., 2::4]
    dh = d[..., 3::4]
    max_ratio = float(np.abs(np.log(wh_ratio_clip)))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    pw = (rois[..., 2] - rois[..., 0] + offset)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + offset)[..., None]
    px = rois[..., 0][..., None] + 0.5 * (pw - offset)
    py = rois[..., 1][..., None] + 0.5 * (ph - offset)

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - 0.5 * (gw - offset)
    y1 = gy - 0.5 * (gh - offset)
    x2 = gx + 0.5 * (gw - offset)
    y2 = gy + 0.5 * (gh - offset)
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - offset)
        y1 = jnp.clip(y1, 0, max_shape[0] - offset)
        x2 = jnp.clip(x2, 0, max_shape[1] - offset)
        y2 = jnp.clip(y2, 0, max_shape[0] - offset)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., C, 4)
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, img_shape: Tuple[int, int], offset: float = 1.0) -> jnp.ndarray:
    h, w = img_shape
    x = jnp.clip(boxes[..., 0::2], 0, w - offset)
    y = jnp.clip(boxes[..., 1::2], 0, h - offset)
    out = jnp.empty_like(boxes)
    out = out.at[..., 0::2].set(x)
    out = out.at[..., 1::2].set(y)
    return out
