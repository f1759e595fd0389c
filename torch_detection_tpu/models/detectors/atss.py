"""ATSS detector: adaptive sample selection, focal+GIoU+centerness loss.

Seventh detector family (Zhang et al., CVPR 2020), beyond the reference's
aspirations (TCGGroup/Torch_Detection has no detector tier — SURVEY.md §2
#33 [ABSENT]).  ATSS is the bridge between the anchor-based (RetinaNet) and
anchor-free (FCOS) families already in the zoo: one anchor per location
(``octave_base_scale=8``), targets picked by the adaptive mean+std IoU rule
(``ops.assign.ATSSAssigner``), a centerness branch, and GIoU regression on
decoded boxes.

TPU formulation: everything is fixed-shape — the assigner's per-level top-k
and candidate scatter jit into one program with the loss; decode shares the
per-level preselect -> delta decode -> centerness-weighted NMS pipeline of
the other dense families.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ...ops.anchors import AnchorGenerator
from ...ops.assign import ATSSAssigner
from ...ops.boxes import delta2bbox
from ...ops.losses import (
    binary_cross_entropy,
    iou_loss,
    sigmoid_focal_loss_sparse,
)
from ...ops.nms import NMSResult, multiclass_nms
from ...ops.tpu_gather import gather_rows


@dataclasses.dataclass(frozen=True)
class ATSSConfig:
    num_classes: int = 80
    anchor_generator: AnchorGenerator = AnchorGenerator(
        strides=(8, 16, 32, 64, 128),
        ratios=(1.0,),
        octave_base_scale=8.0,
        scales_per_octave=1,
    )
    target_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)
    assigner: ATSSAssigner = ATSSAssigner(topk=9)
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    reg_loss_weight: float = 2.0
    # inference
    score_thr: float = 0.05
    nms_iou_thr: float = 0.6
    pre_select_per_level: int = 1000
    pre_nms_top_k: int = 1000
    max_detections: int = 100
    approx_top_k: bool = False


def _level_counts(cfg: ATSSConfig, featmap_sizes) -> Tuple[int, ...]:
    a = cfg.anchor_generator.num_base_anchors
    return tuple(h * w * a for (h, w) in featmap_sizes)


def atss_targets(
    cfg: ATSSConfig,
    anchors: jnp.ndarray,  # (N, 4)
    level_counts: Tuple[int, ...],
    anchor_valid: jnp.ndarray,  # (N,) bool
    gt_boxes: jnp.ndarray,  # (G, 4)
    gt_labels: jnp.ndarray,  # (G,) 1-based
    gt_valid: jnp.ndarray,  # (G,) bool
    level_grids=None,
    img_hw=None,
):
    """Per-anchor (label0 [-1 = bg], matched gt box, centerness target)."""
    assign = cfg.assigner(
        anchors, level_counts, gt_boxes, gt_valid, gt_labels,
        anchor_valid=anchor_valid, level_grids=level_grids, img_hw=img_hw,
    )
    pos = assign.assigned_gt_inds > 0
    safe_gt = jnp.clip(assign.assigned_gt_inds - 1, 0, gt_boxes.shape[0] - 1)
    # one-hot matmul, not gt_boxes[safe_gt]: anchor-scale gathers run ~10x
    # off roofline on TPU (see ops/tpu_gather.py)
    matched = gather_rows(gt_boxes, safe_gt)  # (N, 4)
    label0 = jnp.where(pos, assign.labels - 1, -1).astype(jnp.int32)

    # centerness of the anchor center inside its matched gt (the ATSS rule:
    # same formula as FCOS but measured from the anchor center)
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    l = acx - matched[:, 0]
    t = acy - matched[:, 1]
    r = matched[:, 2] - acx
    b = matched[:, 3] - acy
    eps = 1e-6
    lr_min = jnp.minimum(l, r)
    lr_max = jnp.maximum(jnp.maximum(l, r), eps)
    tb_min = jnp.minimum(t, b)
    tb_max = jnp.maximum(jnp.maximum(t, b), eps)
    ctr = jnp.sqrt(
        jnp.clip(lr_min / lr_max, 0, 1) * jnp.clip(tb_min / tb_max, 0, 1)
    )
    return label0, matched, jnp.where(pos, ctr, 0.0)


def _flatten(cfg, cls_scores, bbox_preds, centernesses):
    b = cls_scores[0].shape[0]
    fc = jnp.concatenate([s.reshape(b, -1, cfg.num_classes) for s in cls_scores], 1)
    fr = jnp.concatenate([r.reshape(b, -1, 4).astype(jnp.float32) for r in bbox_preds], 1)
    fct = jnp.concatenate([c.reshape(b, -1).astype(jnp.float32) for c in centernesses], 1)
    return fc, fr, fct


def atss_loss(
    cfg: ATSSConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    centernesses: Sequence[jax.Array],
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
    img_shapes: Optional[jax.Array] = None,  # (B, 2) un-padded (h, w)
) -> Dict[str, jax.Array]:
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    anchors = cfg.anchor_generator.flat_anchors(featmap_sizes)  # (N, 4)
    level_counts = _level_counts(cfg, featmap_sizes)
    fc, fr, fct = _flatten(cfg, cls_scores, bbox_preds, centernesses)

    centers_x = (anchors[:, 0] + anchors[:, 2]) * 0.5
    centers_y = (anchors[:, 1] + anchors[:, 3]) * 0.5
    if img_shapes is None:
        anchor_valid_fn = lambda i: jnp.ones((anchors.shape[0],), bool)
    else:
        def anchor_valid_fn(i):
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            return (centers_x < w) & (centers_y < h)

    # one anchor per location -> the assigner can use the windowed top-k
    # candidate path (~10x cheaper than the full (G, N_l) distance matrix)
    level_grids = None
    if cfg.anchor_generator.num_base_anchors == 1:
        level_grids = tuple(
            (h, w, float(s))
            for (h, w), s in zip(featmap_sizes, cfg.anchor_generator.strides)
        )

    def one_image(i):
        label0, matched, ctr_t = atss_targets(
            cfg, anchors, level_counts, anchor_valid_fn(i),
            gt_boxes[i], gt_labels[i], gt_valid[i],
            level_grids=level_grids,
            img_hw=None if img_shapes is None else img_shapes[i],
        )
        pos = label0 >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        cls_l = sigmoid_focal_loss_sparse(
            fc[i], label0, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
            avg_factor=num_pos,
        )
        pred_boxes = delta2bbox(
            anchors, fr[i], cfg.target_means, cfg.target_stds,
            wh_ratio_clip=16 / 1000,
        )
        ctr_w = jnp.where(pos, ctr_t, 0.0)
        ctr_sum = jnp.maximum(jnp.sum(ctr_w), 1e-6)
        # offset=1.0 (default): decoded boxes and gts are in the repo's
        # inclusive-pixel convention (delta2bbox), unlike FCOS's continuous
        # point geometry
        reg_l = iou_loss(
            pred_boxes, matched, weight=ctr_w, mode="giou", avg_factor=ctr_sum,
        )
        ctr_l = binary_cross_entropy(
            fct[i], ctr_t, weight=pos.astype(jnp.float32), avg_factor=num_pos
        )
        return cls_l, reg_l, ctr_l, jnp.sum(pos)

    cls_l, reg_l, ctr_l, num_pos = jax.vmap(one_image)(jnp.arange(gt_boxes.shape[0]))
    loss_cls = jnp.mean(cls_l)
    loss_reg = jnp.mean(reg_l) * cfg.reg_loss_weight
    loss_ctr = jnp.mean(ctr_l)
    return {
        "loss_cls": loss_cls,
        "loss_reg": loss_reg,
        "loss_centerness": loss_ctr,
        "loss": loss_cls + loss_reg + loss_ctr,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def decode_atss(
    cfg: ATSSConfig,
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    centernesses: Sequence[jax.Array],
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Per-level preselect -> delta decode -> centerness-weighted NMS."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in cls_scores]
    level_anchors = cfg.anchor_generator.grid_anchors(featmap_sizes)
    b = cls_scores[0].shape[0]
    top_k_fn = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k

    sel_s, sel_a, sel_r, sel_c = [], [], [], []
    for lvl, (s_l, r_l, c_l) in enumerate(zip(cls_scores, bbox_preds, centernesses)):
        # f32 casts before top-k/gather are load-bearing on the TPU runtime
        # (see decode_detections NOTE in single_stage.py)
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
            a = level_anchors[lvl][idx]
        else:
            a = jnp.broadcast_to(level_anchors[lvl][None], (b, n_l, 4))
        sel_s.append(s)
        sel_a.append(a)
        sel_r.append(r)
        sel_c.append(c)

    scores = jax.nn.sigmoid(jnp.concatenate(sel_s, 1))
    anchors_b = jnp.concatenate(sel_a, 1)
    regs = jnp.concatenate(sel_r, 1)
    ctr = jax.nn.sigmoid(jnp.concatenate(sel_c, 1))

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
