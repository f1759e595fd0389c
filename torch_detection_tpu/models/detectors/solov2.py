"""SOLOv2: dense instance segmentation by location (eighteenth family).

Wang et al., NeurIPS 2020.  No boxes, no anchors, no RoIAlign: each FPN
level is divided into an S x S grid; a cell whose region contains an
object's mass center predicts (a) the class and (b) an E-vector that acts
as a dynamic 1x1 convolution over a unified stride-4 mask feature map.
Suppression is Matrix NMS — score decay from pairwise mask IoU, computed
as two matmuls (``ops/nms.py:matrix_nms``) instead of a sequential greedy
loop.  Reference context: TCGGroup/Torch_Detection has no detector tier
(SURVEY.md §2 #33); this adds the segment-by-location paradigm next to
Mask R-CNN's detect-then-segment.

TPU-first formulation (fixed shapes everywhere):
* per-level cell->gt assignment is a dense masked reduction over the
  (S^2, G) candidate matrix (mass-center region from the stride-4 gt
  masks, sigma-shrunk box extents, clamped to the center cell +-1 — the
  official rule); ties resolve to the SMALLEST-area gt (deterministic;
  the official implementation overwrites in annotation order).
* the mask loss runs on a fixed ``max_pos_cells`` slate selected
  positives-first by ``top_k`` — dynamic conv is one (P, E) @ (E, H/4*W/4)
  matmul; gt targets ride the one-hot ``gather_rows`` form (large-output
  gather rule, ops/tpu_gather.py).
* decode: flat top-k over cell-class pairs (DETR-style), one matmul for
  all K candidate masks, maskness rescoring, Matrix NMS, mask-extent
  boxes, and a bilinear crop of each kept mask into the (M, M) patch the
  MaskDetections protocol expects — so segm eval, TTA and serving reuse
  the Mask R-CNN machinery unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.losses import dice_loss, sigmoid_focal_loss_sparse
from ...ops.nms import matrix_nms
from ...ops.tpu_gather import gather_rows
from ...utils.registry import BACKBONES, DETECTORS, HEADS, NECKS
from .mask_rcnn import MaskDetections

INF = 1e8


@DETECTORS.register_module
class SOLOV2(nn.Module):
    """backbone + neck + SOLOV2Head + MaskFeatHead.

    ``__call__`` -> (per-level cls (B,S,S,C), per-level kernels (B,S,S,E),
    mask features (B, H/4, W/4, E)).
    """

    backbone: Dict[str, Any]
    neck: Dict[str, Any]
    head: Dict[str, Any]
    mask_feat_head: Dict[str, Any]

    def setup(self):
        self.backbone_mod = BACKBONES.build(dict(self.backbone), name="backbone")
        self.neck_mod = NECKS.build(dict(self.neck), name="neck")
        self.head_mod = HEADS.build(dict(self.head), name="head")
        self.mask_feat_mod = HEADS.build(
            dict(self.mask_feat_head), name="mask_feat_head"
        )

    def __call__(self, images: jax.Array, train: bool = False):
        feats = self.backbone_mod(images, train=train)
        feats = self.neck_mod(feats, train=train)
        cls_scores, kernels = self.head_mod(feats, train=train)
        mask_feat = self.mask_feat_mod(feats, train=train)
        return cls_scores, kernels, mask_feat


@dataclasses.dataclass(frozen=True)
class SOLOV2Config:
    num_classes: int = 80
    grid_numbers: Tuple[int, ...] = (40, 36, 24, 16, 12)
    # sqrt(bbox area) band per level (official SOLOv2 ranges)
    scale_ranges: Tuple[Tuple[float, float], ...] = (
        (1.0, 96.0), (48.0, 192.0), (96.0, 384.0), (192.0, 768.0), (384.0, 2048.0)
    )
    sigma: float = 0.2  # center-region shrink factor
    mask_stride: int = 4  # stride of the unified mask feature map
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    dice_weight: float = 3.0  # official ins loss weight
    max_pos_cells: int = 256  # fixed mask-loss slate (positives-first)
    # inference
    score_thr: float = 0.1
    update_thr: float = 0.05  # post-matrix-NMS score floor
    mask_thr: float = 0.5
    pre_nms_top_k: int = 256
    max_detections: int = 100
    nms_method: str = "gauss"
    nms_sigma: float = 2.0
    mask_out_size: int = 28  # (M, M) patch fed to the paste protocol
    approx_top_k: bool = False

    @property
    def num_cells(self) -> int:
        return sum(s * s for s in self.grid_numbers)


def _downsample_masks(gt_masks: jax.Array, stride: int) -> jax.Array:
    """(G, H, W) u8 -> (G, H/stride, W/stride) f32 in {0, 1} via mean-pool.

    The canvas is size_divisor-aligned so H, W divide exactly.
    """
    g, h, w = gt_masks.shape
    x = gt_masks.reshape(g, h // stride, stride, w // stride, stride)
    frac = jnp.mean(x.astype(jnp.float32), axis=(2, 4))
    return (frac > 0.5).astype(jnp.float32)


def solov2_targets(
    cfg: SOLOV2Config,
    gt_boxes: jax.Array,  # (G, 4) xyxy image coords
    gt_labels: jax.Array,  # (G,) 1-based
    gt_valid: jax.Array,  # (G,) bool
    ds_masks: jax.Array,  # (G, H4, W4) stride-4 binary masks
    canvas_hw: Tuple[int, int],  # image canvas (H, W)
) -> Tuple[jax.Array, jax.Array]:
    """All-level cell targets -> (label0 (N,), matched gt index (N,)).

    ``label0`` is the 0-based class, -1 for background.  Positive cells are
    those whose grid cell lies inside the sigma-shrunk mass-center region
    (clamped to the mass-center cell +-1) of a gt whose sqrt-area falls in
    the level's scale band; overlaps resolve to the smallest-area gt.
    """
    h_img, w_img = float(canvas_hw[0]), float(canvas_hw[1])
    stride = cfg.mask_stride
    # mass center from the stride-4 masks, in image coordinates
    m = ds_masks  # (G, H4, W4)
    tot = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1e-6)
    ys = (jnp.arange(m.shape[1], dtype=jnp.float32) + 0.5) * stride
    xs = (jnp.arange(m.shape[2], dtype=jnp.float32) + 0.5) * stride
    cm_y = jnp.sum(m * ys[None, :, None], axis=(1, 2)) / tot  # (G,)
    cm_x = jnp.sum(m * xs[None, None, :], axis=(1, 2)) / tot
    has_mask = jnp.sum(m, axis=(1, 2)) > 0

    bw = jnp.maximum(gt_boxes[:, 2] - gt_boxes[:, 0], 0.0)
    bh = jnp.maximum(gt_boxes[:, 3] - gt_boxes[:, 1], 0.0)
    areas = bw * bh
    scale = jnp.sqrt(areas)
    half_w = 0.5 * bw * cfg.sigma
    half_h = 0.5 * bh * cfg.sigma

    labels_parts, gtidx_parts = [], []
    for s, (lo, hi) in zip(cfg.grid_numbers, cfg.scale_ranges):
        in_band = (scale >= lo) & (scale <= hi) & gt_valid & has_mask
        # grid coordinates of the mass center and the shrunk region
        ci = jnp.clip(jnp.floor(cm_y / h_img * s), 0, s - 1)
        cj = jnp.clip(jnp.floor(cm_x / w_img * s), 0, s - 1)
        top = jnp.maximum(jnp.clip(jnp.floor((cm_y - half_h) / h_img * s), 0, s - 1), ci - 1)
        down = jnp.minimum(jnp.clip(jnp.floor((cm_y + half_h) / h_img * s), 0, s - 1), ci + 1)
        left = jnp.maximum(jnp.clip(jnp.floor((cm_x - half_w) / w_img * s), 0, s - 1), cj - 1)
        right = jnp.minimum(jnp.clip(jnp.floor((cm_x + half_w) / w_img * s), 0, s - 1), cj + 1)

        ii = jnp.arange(s, dtype=jnp.float32)
        rows_in = (ii[:, None] >= top[None, :]) & (ii[:, None] <= down[None, :])  # (S, G)
        cols_in = (ii[:, None] >= left[None, :]) & (ii[:, None] <= right[None, :])
        cand = rows_in[:, None, :] & cols_in[None, :, :] & in_band[None, None, :]
        cand = cand.reshape(s * s, -1)  # (S^2, G)
        masked_areas = jnp.where(cand, areas[None, :], INF)
        gi = jnp.argmin(masked_areas, axis=-1)  # (S^2,) smallest-area gt
        has = jnp.any(cand, axis=-1)
        lab = jnp.where(has, gather_rows(gt_labels, gi) - 1, -1).astype(jnp.int32)
        labels_parts.append(lab)
        gtidx_parts.append(gi.astype(jnp.int32))
    return jnp.concatenate(labels_parts), jnp.concatenate(gtidx_parts)


def _flatten_levels(cfg: SOLOV2Config, cls_scores, kernels):
    b = cls_scores[0].shape[0]
    fc = jnp.concatenate(
        [s.reshape(b, -1, cfg.num_classes) for s in cls_scores], axis=1
    )
    fk = jnp.concatenate([k.reshape(b, -1, k.shape[-1]) for k in kernels], axis=1)
    return fc, fk


def solov2_loss(
    cfg: SOLOV2Config,
    cls_scores: Sequence[jax.Array],
    kernels: Sequence[jax.Array],
    mask_feat: jax.Array,  # (B, H4, W4, E)
    gt_boxes: jax.Array,  # (B, G, 4)
    gt_labels: jax.Array,  # (B, G)
    gt_valid: jax.Array,  # (B, G)
    gt_masks: jax.Array,  # (B, G, H, W) uint8
) -> Dict[str, jax.Array]:
    fc, fk = _flatten_levels(cfg, cls_scores, kernels)
    b, h4, w4, e = mask_feat.shape
    canvas_hw = (h4 * cfg.mask_stride, w4 * cfg.mask_stride)
    p = cfg.max_pos_cells

    def one_image(i):
        ds = _downsample_masks(gt_masks[i], cfg.mask_stride)  # (G, H4, W4)
        label0, gtidx = solov2_targets(
            cfg, gt_boxes[i], gt_labels[i], gt_valid[i], ds, canvas_hw
        )
        pos = label0 >= 0
        num_pos = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        cls_l = sigmoid_focal_loss_sparse(
            fc[i].astype(jnp.float32), label0,
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha, avg_factor=num_pos,
        )
        # fixed positives-first slate: top_k on the pos flag is stable
        # (lowest index wins ties), so the first num_pos slots are positives
        flag, idx = jax.lax.top_k(pos.astype(jnp.float32), p)
        sel_pos = flag > 0.5
        k_sel = fk[i][idx].astype(jnp.float32)  # (P, E) small-output gather
        logits = k_sel @ mask_feat[i].astype(jnp.float32).reshape(-1, e).T  # (P, H4*W4)
        probs = jax.nn.sigmoid(logits)
        tgt = gather_rows(ds.reshape(ds.shape[0], -1), gtidx[idx])  # (P, H4*W4)
        mask_l = dice_loss(
            probs, tgt, weight=sel_pos.astype(jnp.float32), avg_factor=num_pos
        )
        return cls_l, mask_l, jnp.sum(pos)

    cls_l, mask_l, num_pos = jax.vmap(one_image)(jnp.arange(b))
    loss_cls = jnp.mean(cls_l)
    loss_mask = jnp.mean(mask_l) * cfg.dice_weight
    return {
        "loss_cls": loss_cls,
        "loss_mask": loss_mask,
        "loss": loss_cls + loss_mask,
        "num_pos": jnp.mean(num_pos.astype(jnp.float32)),
    }


def _mask_extent_boxes(binary: jax.Array, stride: int) -> jax.Array:
    """(D, H4, W4) binary -> (D, 4) xyxy boxes in image coords (+1 conv.)."""
    d, h4, w4 = binary.shape
    col_any = jnp.max(binary, axis=1)  # (D, W4)
    row_any = jnp.max(binary, axis=2)  # (D, H4)
    js = jnp.arange(w4, dtype=jnp.float32)
    is_ = jnp.arange(h4, dtype=jnp.float32)
    x1 = jnp.min(jnp.where(col_any > 0, js[None], INF), axis=1) * stride
    x2 = (jnp.max(jnp.where(col_any > 0, js[None], -1.0), axis=1) + 1.0) * stride - 1.0
    y1 = jnp.min(jnp.where(row_any > 0, is_[None], INF), axis=1) * stride
    y2 = (jnp.max(jnp.where(row_any > 0, is_[None], -1.0), axis=1) + 1.0) * stride - 1.0
    empty = jnp.sum(binary, axis=(1, 2)) <= 0
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    return jnp.where(empty[:, None], 0.0, boxes)


def _crop_patches(
    probs: jax.Array,  # (D, H4, W4) mask probabilities on the canvas
    boxes: jax.Array,  # (D, 4) xyxy image coords
    stride: int,
    out_size: int,
) -> jax.Array:
    """Bilinear crop each mask into its box -> (D, M, M) patches.

    Sampling weights are dense hat functions max(0, 1 - |c - p|) over the
    canvas axes — two small matmuls per detection, exact linear
    interpolation, no gathers.
    """
    d, h4, w4 = probs.shape
    m = out_size

    def one(pr, box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        t = (jnp.arange(m, dtype=jnp.float32) + 0.5) / m
        ys = (y1 + t * jnp.maximum(y2 - y1, 1.0)) / stride - 0.5  # canvas coords
        xs = (x1 + t * jnp.maximum(x2 - x1, 1.0)) / stride - 0.5
        wy = jnp.clip(1.0 - jnp.abs(ys[:, None] - jnp.arange(h4)[None, :]), 0.0, 1.0)
        wx = jnp.clip(1.0 - jnp.abs(xs[:, None] - jnp.arange(w4)[None, :]), 0.0, 1.0)
        return wy @ pr @ wx.T  # (M, M)

    return jax.vmap(one)(probs.astype(jnp.float32), boxes)


def decode_solov2(
    cfg: SOLOV2Config,
    cls_scores: Sequence[jax.Array],
    kernels: Sequence[jax.Array],
    mask_feat: jax.Array,
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> MaskDetections:
    """Flat top-k over cell-class pairs -> dynamic conv -> Matrix NMS.

    Returns the MaskDetections protocol (boxes from mask extents, (M, M)
    box-frame mask patches) so the segm evaluator / TTA / serving reuse the
    Mask R-CNN pasting machinery unchanged.
    """
    fc, fk = _flatten_levels(cfg, cls_scores, kernels)
    b, h4, w4, e = mask_feat.shape
    k = cfg.pre_nms_top_k
    c = cfg.num_classes
    top_k_fn = jax.lax.approx_max_k if cfg.approx_top_k else jax.lax.top_k

    def one_image(i):
        # f32 BEFORE top_k/sort — conv-produced bf16 into sort/gather
        # crashes the TPU runtime (CLAUDE.md rule)
        scores = jax.nn.sigmoid(fc[i].astype(jnp.float32))  # (N, C)
        flat = scores.reshape(-1)
        top_s, top_i = top_k_fn(flat, k)
        cell = top_i // c
        cls0 = (top_i % c).astype(jnp.int32)
        k_sel = fk[i][cell].astype(jnp.float32)  # (K, E)
        logits = k_sel @ mask_feat[i].astype(jnp.float32).reshape(-1, e).T
        probs = jax.nn.sigmoid(logits)  # (K, H4*W4)
        binary = (probs > cfg.mask_thr).astype(jnp.float32)
        area = jnp.sum(binary, axis=-1)
        maskness = jnp.sum(probs * binary, axis=-1) / jnp.maximum(area, 1.0)
        score = top_s * maskness * (area > 0)
        # re-sort by the rescored value (matrix NMS needs descending order);
        # the (K, H4*W4) row permutes ride the one-hot contraction — a row
        # gather with a ~15M-element output is exactly the case the
        # tpu_gather rule exists for
        score, order = jax.lax.top_k(score, k)
        cls0 = cls0[order]
        probs = gather_rows(probs, order)
        binary = gather_rows(binary, order)
        valid = score > cfg.score_thr
        decayed = matrix_nms(
            binary, cls0, score, valid,
            method=cfg.nms_method, sigma=cfg.nms_sigma,
        )
        out_s, keep = jax.lax.top_k(decayed, cfg.max_detections)
        out_cls = cls0[keep]
        out_probs = gather_rows(probs, keep).reshape(-1, h4, w4)
        out_bin = gather_rows(binary, keep).reshape(-1, h4, w4)
        out_v = out_s > cfg.update_thr
        boxes = _mask_extent_boxes(out_bin, cfg.mask_stride)
        if img_shapes is not None:
            hw = img_shapes[i]
            x = jnp.clip(boxes[:, 0::2], 0, hw[1] - 1.0)
            y = jnp.clip(boxes[:, 1::2], 0, hw[0] - 1.0)
            boxes = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        patches = _crop_patches(out_probs, boxes, cfg.mask_stride, cfg.mask_out_size)
        if scale_factors is not None:
            boxes = boxes / scale_factors[i]
        return (
            jnp.where(out_v[:, None], boxes, 0.0),
            jnp.where(out_v, out_s, 0.0),
            jnp.where(out_v, out_cls, -1),
            out_v,
            patches * out_v[:, None, None],
        )

    boxes, scores, labels, valid, patches = jax.vmap(one_image)(jnp.arange(b))
    return MaskDetections(boxes, scores, labels, valid, patches)
