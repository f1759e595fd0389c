"""YOLOv3 detector: config, grid-assigned loss, and fixed-shape decode.

Eighth detector family (reference context: TCGGroup/Torch_Detection ships no
detector tier at all — SURVEY.md §2 #33 [ABSENT]; this follows the canonical
Darknet-53 YOLOv3 recipe).  The model itself is the generic
``SingleStageDetector`` with ``Darknet + YOLOV3Neck + YOLOV3Head``; this
module owns the math around it:

  * **encode/decode** — YOLO box coding: cell-relative center offsets in
    sigmoid space (``t_xy`` target = (gt_c - anchor_c)/stride + 0.5) and
    log-scale sizes vs the anchor prior (``t_wh`` = log(gt_wh / anchor_wh)),
    on the repo-wide inclusive (+1) box convention;
  * **assignment** — ``GridAssigner`` over ``responsible_flags`` (only the
    grid cell containing a gt center may own it), ``ops/assign.py``;
  * **loss** — BCE on xy / objectness / classes, MSE on wh, all fixed-shape
    masked sums normalized by the positive count (the conf term stays tame
    because the head seeds the objectness bias at prior 0.01, the same
    stabilizer the focal families use);
  * **decode** — per-level conf-weighted scores, top-k preselect, shared
    ``multiclass_nms``.

TPU notes: everything is (B, N, 5+C) flat fixed-shape math; the matched-gt
selection uses the one-hot matmul gather (``ops/tpu_gather``) because its
output is anchor-scale (~22k rows at 608x608 — plain gathers are ~10x off
roofline there, see CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.anchors import YOLOAnchorGenerator
from ...ops.assign import GridAssigner
from ...ops.losses import binary_cross_entropy
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows


@dataclasses.dataclass(frozen=True)
class YOLOV3Config:
    num_classes: int = 80
    anchor_generator: YOLOAnchorGenerator = YOLOAnchorGenerator()
    assigner: GridAssigner = GridAssigner(
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0
    )
    loss_xy_weight: float = 2.0
    loss_wh_weight: float = 2.0
    loss_conf_weight: float = 1.0
    loss_cls_weight: float = 1.0
    # inference
    conf_thr: float = 0.005
    score_thr: float = 0.05
    nms_iou_thr: float = 0.45
    pre_select_per_level: int = 1000
    pre_nms_top_k: int = 1000
    max_detections: int = 100
    approx_top_k: bool = False


def _flatten_yolo_outputs(
    cfg: YOLOV3Config, pred_maps: Sequence[jax.Array]
) -> jax.Array:
    """Per-level (B, H, W, A*(5+C)) -> (B, N, 5+C) f32, anchor-major flat
    order matching ``YOLOAnchorGenerator.flat_anchors``."""
    b = pred_maps[0].shape[0]
    c5 = 5 + cfg.num_classes
    return jnp.concatenate(
        [p.reshape(b, -1, c5).astype(jnp.float32) for p in pred_maps], axis=1
    )


def _anchor_geometry(anchors: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(N, 4) xyxy -> centers (N, 2), sizes (N, 2) on the +1 convention."""
    wh = anchors[:, 2:4] - anchors[:, 0:2] + 1.0
    c = anchors[:, 0:2] + 0.5 * (wh - 1.0)
    return c, wh


def yolo_encode(
    anchors: jax.Array,  # (N, 4)
    strides: jax.Array,  # (N,)
    gt: jax.Array,  # (N, 4) matched gt per anchor
    eps: float = 1e-6,
) -> jax.Array:
    """(N, 4) targets [tx, ty, tw, th]: xy in (0, 1) sigmoid space, wh in
    log scale vs the anchor prior."""
    ac, awh = _anchor_geometry(anchors)
    gwh = gt[:, 2:4] - gt[:, 0:2] + 1.0
    gc = gt[:, 0:2] + 0.5 * (gwh - 1.0)
    t_xy = jnp.clip((gc - ac) / strides[:, None] + 0.5, eps, 1.0 - eps)
    t_wh = jnp.log(jnp.clip(gwh / awh, eps, None))
    return jnp.concatenate([t_xy, t_wh], axis=-1)


def yolo_decode(
    anchors: jax.Array,  # (N, 4)
    strides: jax.Array,  # (N,)
    pred: jax.Array,  # (N, 4) raw [tx, ty, tw, th]
    max_wh_ratio: float = 4.135,  # |t_wh| cap, = delta2bbox's 16/1000 clip
) -> jax.Array:
    """Raw box head outputs -> (N, 4) xyxy boxes (inclusive convention)."""
    ac, awh = _anchor_geometry(anchors)
    c = ac + (jax.nn.sigmoid(pred[:, 0:2]) - 0.5) * strides[:, None]
    wh = awh * jnp.exp(jnp.clip(pred[:, 2:4], -max_wh_ratio, max_wh_ratio))
    return jnp.concatenate([c - 0.5 * (wh - 1.0), c + 0.5 * (wh - 1.0)], axis=-1)


def yolo_loss(
    cfg: YOLOV3Config,
    pred_maps: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G) int32, 1-based
    gt_valid: jax.Array,  # (B, G) bool
    img_shapes: Optional[jax.Array] = None,  # (B, 2) un-padded (h, w)
) -> Dict[str, jax.Array]:
    featmap_sizes = [tuple(p.shape[1:3]) for p in pred_maps]
    gen = cfg.anchor_generator
    anchors = gen.flat_anchors(featmap_sizes)  # (N, 4)
    strides = gen.flat_strides(featmap_sizes)  # (N,)
    flat = _flatten_yolo_outputs(cfg, pred_maps)  # (B, N, 5+C)
    n = anchors.shape[0]

    if img_shapes is None:
        anchor_valid_fn = lambda i: jnp.ones((n,), bool)
    else:
        cx = 0.5 * (anchors[:, 0] + anchors[:, 2])
        cy = 0.5 * (anchors[:, 1] + anchors[:, 3])

        def anchor_valid_fn(i):
            return (cx < img_shapes[i, 1]) & (cy < img_shapes[i, 0])

    def one_image(i):
        resp = gen.responsible_flags(featmap_sizes, gt_boxes[i], gt_valid[i])
        assign = cfg.assigner(
            anchors, resp, gt_boxes[i], gt_valid[i], gt_labels[i],
            anchor_valid=anchor_valid_fn(i),
        )
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        num_pos = jnp.sum(pos)
        denom = jnp.maximum(num_pos.astype(jnp.float32), 1.0)

        safe_gt = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_boxes.shape[1] - 1)
        matched = gather_rows(gt_boxes[i], safe_gt)  # (N, 4)
        t_box = yolo_encode(anchors, strides, matched)

        p = flat[i]
        w_pos = pos.astype(jnp.float32)
        loss_xy = binary_cross_entropy(
            p[:, 0:2], t_box[:, 0:2], weight=w_pos[:, None], avg_factor=denom
        )
        loss_wh = jnp.sum(
            jnp.square(p[:, 2:4] - t_box[:, 2:4]) * w_pos[:, None]
        ) / denom
        loss_conf = binary_cross_entropy(
            p[:, 4], w_pos, weight=(pos | neg).astype(jnp.float32),
            avg_factor=denom,
        )
        cls_onehot = jax.nn.one_hot(
            jnp.clip(assign.labels - 1, 0, cfg.num_classes - 1),
            cfg.num_classes, dtype=jnp.float32,
        )
        loss_cls = binary_cross_entropy(
            p[:, 5:], cls_onehot, weight=w_pos[:, None], avg_factor=denom
        )
        return loss_xy, loss_wh, loss_conf, loss_cls, num_pos

    xy, wh, conf, cls_, num_pos = jax.vmap(one_image)(jnp.arange(flat.shape[0]))
    loss_xy = jnp.mean(xy) * cfg.loss_xy_weight
    loss_wh = jnp.mean(wh) * cfg.loss_wh_weight
    loss_conf = jnp.mean(conf) * cfg.loss_conf_weight
    loss_cls = jnp.mean(cls_) * cfg.loss_cls_weight
    return {
        "loss_xy": loss_xy,
        "loss_wh": loss_wh,
        "loss_conf": loss_conf,
        "loss_cls": loss_cls,
        "loss": loss_xy + loss_wh + loss_conf + loss_cls,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def decode_yolo(
    cfg: YOLOV3Config,
    pred_maps: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,  # (B, 2)
    scale_factors: Optional[jax.Array] = None,  # (B,)
) -> NMSResult:
    """Per-level conf*cls scores -> top-k preselect -> decode -> NMS,
    (B, max_detections) padded."""
    featmap_sizes = [tuple(p.shape[1:3]) for p in pred_maps]
    gen = cfg.anchor_generator
    level_anchors = gen.grid_anchors(featmap_sizes)
    b = pred_maps[0].shape[0]
    c5 = 5 + cfg.num_classes
    top_k_fn = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k

    sel_pred, sel_anchor, sel_stride = [], [], []
    for lvl, pm in enumerate(pred_maps):
        # f32 before top-k/gather: conv-produced bf16 into sort/gather
        # kernels faults the TPU runtime (see CLAUDE.md)
        p = pm.reshape(b, -1, c5).astype(jnp.float32)  # (B, Nl, 5+C)
        n_l = p.shape[1]
        k = min(cfg.pre_select_per_level, n_l)
        if k < n_l:
            # rank by objectness (the dominant score factor)
            _, idx = top_k_fn(p[:, :, 4], k)
            p = jnp.take_along_axis(p, idx[..., None], axis=1)
            a = level_anchors[lvl][idx]
        else:
            a = jnp.broadcast_to(level_anchors[lvl][None], (b, n_l, 4))
        sel_pred.append(p)
        sel_anchor.append(a)
        sel_stride.append(
            jnp.full((p.shape[1],), float(gen.strides[lvl]), jnp.float32)
        )

    pred = jnp.concatenate(sel_pred, axis=1)  # (B, M, 5+C)
    anchors_b = jnp.concatenate(sel_anchor, axis=1)  # (B, M, 4)
    strides = jnp.concatenate(sel_stride, axis=0)  # (M,)

    conf = jax.nn.sigmoid(pred[..., 4])  # (B, M)
    conf = jnp.where(conf >= cfg.conf_thr, conf, 0.0)
    scores = jax.nn.sigmoid(pred[..., 5:]) * conf[..., None]  # (B, M, C)

    def one_image(i):
        boxes = yolo_decode(anchors_b[i], strides, pred[i, :, 0:4])
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
