"""Sparse R-CNN: learnable proposals + iterative dynamic-interaction heads.

Sixteenth detector family (Sun et al., CVPR 2021), beyond the reference
(TCGGroup/Torch_Detection has no detector tier — SURVEY.md §2 #33
[ABSENT]).  Chosen over the deformable families (RepPoints, Deformable
DETR) on measured grounds: per-location fractional deformable sampling is
gather-bound on TPU (41.7 ms/op @ b8 for the 4-corner gather at one FPN
level; 69.8 ms for the gather-free dense-window densification — see
CLAUDE.md r5 notes), while Sparse R-CNN's compute graph maps cleanly onto
the MXU:

  * a FIXED set of learnable proposal boxes + features (no RPN, no dense
    anchors, no NMS) — every stage is static-shape by construction;
  * RoI feature extraction rides the existing Pallas RoIAlign kernel
    (``ops/roi_align_pallas.py``, fwd + hand-written bwd);
  * the "dynamic interaction" that replaces dense attention over pixels is
    two per-proposal batched matmuls (roi features contracted with
    parameters GENERATED from the proposal feature) — pure MXU work;
  * set-prediction training reuses the on-device Hungarian matcher
    (``ops/hungarian.py``) vmapped over stages x images, exactly like DETR.

Semantics follow the paper + mmdet's SparseRCNN/DIIHead/DynamicConv
(focal classification cost/loss, L1 on normalized xyxy, GIoU on absolute
boxes, per-stage matching, boxes detached between stages, RoIAlign gives
no box gradient so stage-0 gradients reach the proposal-box parameters
through the delta decode only).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.boxes import delta2bbox
from ...ops.hungarian import linear_sum_assignment
from ...ops.losses import iou_loss, sigmoid_focal_loss_sparse
from ...ops.nms import NMSResult
from ...ops.roi_align import batched_multilevel_roi_align
from ...utils.registry import BACKBONES, DETECTORS, NECKS
from ..inits import bias_init_with_prob

Dtype = Any


class _DynamicConv(nn.Module):
    """Proposal-conditioned interaction: the proposal feature generates the
    weights of two 1x1 convs applied to its OWN roi features (paper §3.3,
    mmdet ``DynamicConv``).  Per-proposal batched matmuls on the MXU."""

    d_model: int = 256
    dynamic_dim: int = 64
    roi_size: int = 7
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, roi_feats: jax.Array, obj: jax.Array) -> jax.Array:
        # roi_feats: (B, N, S, S, C); obj: (B, N, C)
        if roi_feats.shape[-1] != self.d_model:
            raise ValueError(
                f"roi feature channels ({roi_feats.shape[-1]}) must equal "
                f"d_model ({self.d_model}) — set the neck's out_channels to "
                "d_model"
            )
        b, n = obj.shape[:2]
        s2 = self.roi_size * self.roi_size
        d, k = self.d_model, self.dynamic_dim
        params = nn.Dense(2 * d * k, dtype=self.dtype, name="param_gen")(obj)
        p1 = params[..., : d * k].reshape(b, n, d, k)
        p2 = params[..., d * k:].reshape(b, n, k, d)
        f = roi_feats.reshape(b, n, s2, d).astype(params.dtype)
        f = jnp.einsum("bnsc,bnck->bnsk", f, p1)
        f = nn.relu(nn.LayerNorm(dtype=jnp.float32, name="norm1")(f)).astype(params.dtype)
        f = jnp.einsum("bnsk,bnkc->bnsc", f, p2)
        f = nn.relu(nn.LayerNorm(dtype=jnp.float32, name="norm2")(f)).astype(params.dtype)
        f = f.reshape(b, n, s2 * d)
        return nn.Dense(d, dtype=self.dtype, name="fc_out")(f)


class _DIIHead(nn.Module):
    """One iteration stage: proposal self-attention -> dynamic interaction
    -> FFN -> (class logits, box deltas) (mmdet ``DIIHead``)."""

    num_classes: int = 80
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dynamic_dim: int = 64
    roi_size: int = 7
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, roi_feats: jax.Array, obj: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=self.dtype,
            name="self_attn",
        )(obj, obj, obj)
        obj = nn.LayerNorm(dtype=jnp.float32, name="norm_attn")(obj + sa).astype(sa.dtype)

        inter = _DynamicConv(
            self.d_model, self.dynamic_dim, self.roi_size, self.dtype,
            name="dynamic_conv",
        )(roi_feats, obj)
        obj = nn.LayerNorm(dtype=jnp.float32, name="norm_inter")(obj + inter).astype(sa.dtype)

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="ffn_fc1")(obj)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn_fc2")(nn.relu(h))
        obj = nn.LayerNorm(dtype=jnp.float32, name="norm_ffn")(obj + h).astype(sa.dtype)

        c = obj
        for i in range(self.num_cls_fcs):
            c = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                         name=f"cls_fc{i}")(c)
            c = nn.relu(nn.LayerNorm(dtype=jnp.float32, name=f"cls_norm{i}")(c))
        logits = nn.Dense(
            self.num_classes, dtype=jnp.float32,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.full(
                shape, bias_init_with_prob(0.01), dtype),
            name="fc_cls",
        )(c)

        r = obj
        for i in range(self.num_reg_fcs):
            r = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                         name=f"reg_fc{i}")(r)
            r = nn.relu(nn.LayerNorm(dtype=jnp.float32, name=f"reg_norm{i}")(r))
        deltas = nn.Dense(4, dtype=jnp.float32, name="fc_reg")(r)
        return obj, logits, deltas


def _cxcywh_to_xyxy_cont(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


@DETECTORS.register_module
class SparseRCNN(nn.Module):
    """backbone + FPN -> iterative (RoIAlign -> DIIHead) refinement stages.

    Returns ``(cls_logits, boxes)`` with a leading stage axis
    (S, B, N, num_classes) / (S, B, N, 4); boxes are absolute CONTINUOUS
    xyxy on the input canvas.  The last slice is the prediction; earlier
    slices feed the per-stage set losses.
    """

    backbone: Dict[str, Any]
    neck: Dict[str, Any]
    num_proposals: int = 100
    num_stages: int = 6
    num_classes: int = 80
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dynamic_dim: int = 64
    roi_size: int = 7
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)
    finest_scale: float = 56.0
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3
    # DeltaXYWHBBoxCoder stds of the official config
    target_stds: Tuple[float, float, float, float] = (0.5, 0.5, 1.0, 1.0)
    dtype: Optional[Dtype] = None

    def setup(self):
        self.backbone_mod = BACKBONES.build(dict(self.backbone), name="backbone")
        self.neck_mod = NECKS.build(dict(self.neck), name="neck")
        # learnable initial proposals: normalized (cx, cy, w, h), image-filling
        self.proposal_boxes = self.param(
            "proposal_boxes",
            lambda key, shape: jnp.tile(
                jnp.asarray([[0.5, 0.5, 1.0, 1.0]], jnp.float32),
                (shape[0], 1),
            ),
            (self.num_proposals, 4),
        )
        self.proposal_features = self.param(
            "proposal_features", nn.initializers.normal(1.0),
            (self.num_proposals, self.d_model),
        )
        self.stages = [
            _DIIHead(
                self.num_classes, self.d_model, self.nhead,
                self.dim_feedforward, self.dynamic_dim, self.roi_size,
                self.num_cls_fcs, self.num_reg_fcs, self.dtype,
                name=f"stage{i}",
            )
            for i in range(self.num_stages)
        ]

    def __call__(
        self,
        images: jax.Array,  # (B, H, W, 3)
        img_shapes: Optional[jax.Array] = None,  # (B, 2) un-padded (h, w)
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        feats = self.neck_mod(self.backbone_mod(images, train=train), train=train)
        b = images.shape[0]
        if img_shapes is None:
            img_shapes = jnp.broadcast_to(
                jnp.asarray(images.shape[1:3], jnp.float32), (b, 2)
            )
        hw = img_shapes.astype(jnp.float32)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1)  # (B, 4)

        pb = self.proposal_boxes
        # keep the learnable slate well-formed whatever the optimizer does
        pb = jnp.concatenate(
            [pb[:, :2], jnp.maximum(pb[:, 2:], 1e-2)], axis=-1
        )
        boxes = _cxcywh_to_xyxy_cont(pb)[None] * scale[:, None, :]  # (B, N, 4)
        obj = jnp.broadcast_to(
            self.proposal_features[None], (b, self.num_proposals, self.d_model)
        ).astype(feats[0].dtype)

        all_logits, all_boxes = [], []
        for i, stage in enumerate(self.stages):
            # stage 0 keeps the live boxes so the proposal-box parameters
            # learn through the delta decode; later stages consume the
            # previous stage's boxes DETACHED (mmdet SparseRoIHead semantics)
            if i > 0:
                boxes = jax.lax.stop_gradient(boxes)
            # continuous xyxy -> the repo's inclusive convention for RoIAlign
            # (RoIAlign itself never backprops to boxes — match that exactly)
            rois_inc = jax.lax.stop_gradient(
                jnp.concatenate([boxes[..., :2], boxes[..., 2:] - 1.0], axis=-1)
            )
            roi_feats = batched_multilevel_roi_align(
                list(feats[: len(self.roi_strides)]), rois_inc,
                self.roi_strides, self.roi_size, finest_scale=self.finest_scale,
            )
            obj, logits, deltas = stage(roi_feats, obj)
            rois_live = jnp.concatenate(
                [boxes[..., :2], boxes[..., 2:] - 1.0], axis=-1
            )
            boxes_inc = delta2bbox(rois_live, deltas, stds=self.target_stds)
            boxes = jnp.concatenate(
                [boxes_inc[..., :2], boxes_inc[..., 2:] + 1.0], axis=-1
            )
            all_logits.append(logits)
            all_boxes.append(boxes)
        return jnp.stack(all_logits), jnp.stack(all_boxes)


@dataclasses.dataclass(frozen=True)
class SparseRCNNConfig:
    num_classes: int = 80
    num_proposals: int = 100
    # matching-cost and loss weights (paper / mmdet defaults)
    cls_weight: float = 2.0
    l1_weight: float = 5.0
    giou_weight: float = 2.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # inference
    score_thr: float = 0.0
    max_detections: int = 100


def _stage_loss(cfg: SparseRCNNConfig, logits, boxes, gt_xyxy, gt_labels,
                gt_valid, whwh, num_boxes):
    """Hungarian-matched set loss for ONE stage, one image.

    ``boxes``/``gt_xyxy`` are absolute continuous xyxy; L1 runs on the
    whwh-normalized coordinates (mmdet BBoxL1Cost/L1Loss semantics)."""
    q = logits.shape[0]
    p = jax.nn.sigmoid(jax.lax.stop_gradient(logits))  # (Q, C)
    pb = jax.lax.stop_gradient(boxes)

    lab0 = jnp.clip(gt_labels - 1, 0, logits.shape[-1] - 1)  # 0-based classes
    eps = 1e-8
    pos_cost = -jnp.log(p + eps) * cfg.focal_alpha * (1 - p) ** cfg.focal_gamma
    neg_cost = -jnp.log(1 - p + eps) * (1 - cfg.focal_alpha) * p ** cfg.focal_gamma
    cost_cls = (pos_cost - neg_cost)[:, lab0].T  # (G, Q)

    pb_n = pb / whwh
    gt_n = gt_xyxy / whwh
    cost_l1 = jnp.sum(jnp.abs(gt_n[:, None, :] - pb_n[None, :, :]), axis=-1)
    cost_giou = (
        iou_loss(pb[None, :, :], gt_xyxy[:, None, :], mode="giou", offset=0.0)
        - 1.0
    )
    cost = (
        cfg.cls_weight * cost_cls
        + cfg.l1_weight * cost_l1
        + cfg.giou_weight * cost_giou
    )
    col4row = linear_sum_assignment(cost, row_valid=gt_valid)  # (G,)

    # classification: focal over ALL (Q, C) logits; matched queries carry
    # their gt class, the rest are all-negative rows (label -1)
    cols = jnp.where(gt_valid, col4row, q)
    tgt = jnp.full((q + 1,), -1, jnp.int32)
    tgt = tgt.at[cols].set(jnp.where(gt_valid, lab0, -1))[:q]
    loss_cls = sigmoid_focal_loss_sparse(
        logits, tgt, gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
    ) / num_boxes

    matched = boxes[jnp.clip(col4row, 0, q - 1)]  # (G, 4)
    vw = gt_valid.astype(jnp.float32)
    loss_l1 = jnp.sum(vw[:, None] * jnp.abs(matched / whwh - gt_n)) / num_boxes
    loss_giou = iou_loss(
        matched, gt_xyxy, weight=vw, mode="giou", offset=0.0,
        avg_factor=num_boxes,
    )
    return loss_cls, loss_l1, loss_giou


def sparse_rcnn_loss(
    cfg: SparseRCNNConfig,
    cls_logits: jax.Array,  # (S, B, N, C)
    pred_boxes: jax.Array,  # (S, B, N, 4) absolute continuous xyxy
    gt_boxes: jax.Array,  # (B, G, 4) inclusive xyxy
    gt_labels: jax.Array,  # (B, G) 1-based
    gt_valid: jax.Array,  # (B, G)
    img_shapes: jax.Array,  # (B, 2) un-padded (h, w)
) -> Dict[str, jax.Array]:
    """Per-stage Hungarian set losses, summed over stages (paper eq. 1-2).

    Matching + losses vmap over stages x images into one batched
    fixed-shape program, exactly like ``detr_loss`` (sequential stage
    loops measured 6x wall-clock on the DETR tier)."""
    bsz = gt_boxes.shape[0]
    num_boxes = jnp.maximum(jnp.sum(gt_valid.astype(jnp.float32)), 1.0) / bsz

    def one_image(i):
        hw = img_shapes[i].astype(jnp.float32)
        whwh = jnp.stack([hw[1], hw[0], hw[1], hw[0]])
        # inclusive gt -> continuous edges
        gt_xyxy = jnp.concatenate(
            [gt_boxes[i][:, :2], gt_boxes[i][:, 2:] + 1.0], axis=-1
        )
        gt_xyxy = jnp.where(gt_valid[i][:, None], gt_xyxy, 0.0)

        def one_stage(logits, boxes):
            return _stage_loss(
                cfg, logits, boxes, gt_xyxy, gt_labels[i], gt_valid[i],
                whwh, num_boxes,
            )

        cls_l, l1_l, giou_l = jax.vmap(one_stage)(
            cls_logits[:, i], pred_boxes[:, i]
        )
        return jnp.sum(cls_l), jnp.sum(l1_l), jnp.sum(giou_l)

    cls_l, l1_l, giou_l = jax.vmap(one_image)(jnp.arange(bsz))
    loss_cls = jnp.mean(cls_l) * cfg.cls_weight
    loss_l1 = jnp.mean(l1_l) * cfg.l1_weight
    loss_giou = jnp.mean(giou_l) * cfg.giou_weight
    return {
        "loss_cls": loss_cls,
        "loss_l1": loss_l1,
        "loss_giou": loss_giou,
        "loss": loss_cls + loss_l1 + loss_giou,
        "num_pos": jnp.mean(jnp.sum(gt_valid.astype(jnp.float32), -1)),
    }


def decode_sparse_rcnn(
    cfg: SparseRCNNConfig,
    cls_logits: jax.Array,  # (S, B, N, C)
    pred_boxes: jax.Array,  # (S, B, N, 4) absolute continuous xyxy
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Top-k over (proposal, class) sigmoid scores of the LAST stage — no
    NMS (set prediction is one-to-one by construction, paper §3.4)."""
    logits = cls_logits[-1]
    boxes_abs = pred_boxes[-1]
    b, q, c = logits.shape
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))

    def one_image(i):
        flat = probs[i].reshape(-1)  # (Q*C,)
        k = min(cfg.max_detections, flat.shape[0])
        top_s, top_idx = jax.lax.top_k(flat, k)
        qi = (top_idx // c).astype(jnp.int32)
        li = (top_idx % c).astype(jnp.int32)
        bx = boxes_abs[i][qi]  # continuous xyxy
        # back to the inclusive convention
        bx = jnp.concatenate([bx[:, :2], bx[:, 2:] - 1.0], axis=-1)
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            x = jnp.clip(bx[:, 0::2], 0, w - 1.0)
            y = jnp.clip(bx[:, 1::2], 0, h - 1.0)
            bx = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        if scale_factors is not None:
            bx = bx / scale_factors[i]
        valid = top_s > cfg.score_thr
        pad = cfg.max_detections - k
        if pad:
            bx = jnp.pad(bx, ((0, pad), (0, 0)))
            top_s = jnp.pad(top_s, ((0, pad),))
            li = jnp.pad(li, ((0, pad),), constant_values=-1)
            qi = jnp.pad(qi, ((0, pad),))
            valid = jnp.pad(valid, ((0, pad),))
        return NMSResult(
            bx, jnp.where(valid, top_s, 0.0),
            jnp.where(valid, li, -1), valid, jnp.where(valid, qi, -1),
        )

    return jax.vmap(one_image)(jnp.arange(b))
