"""DETR: end-to-end set-prediction detection with a transformer.

Twelfth detector family (Carion et al., ECCV 2020), beyond the reference
(TCGGroup/Torch_Detection has no detector tier — SURVEY.md §2 #33
[ABSENT]).  The TPU story is strong twice over:

  * the compute graph is backbone-C5 -> 6 encoder + 6 decoder transformer
    layers -> linear heads: pure large matmuls, exactly what the MXU wants —
    no anchors, no NMS, no assignment heuristics;
  * the one historically host-bound piece — optimal bipartite matching of
    predictions to ground truths — runs ON DEVICE inside the jitted train
    step via ``ops.hungarian.linear_sum_assignment`` (exact shortest
    augmenting path in fixed-shape lax loops), so the step never syncs to
    the host.

Conventions: boxes are predicted as normalized (cx, cy, w, h) in [0, 1]
relative to the UN-PADDED image; ground truths convert from the repo's
inclusive xyxy (continuous edges: X2 = x2 + 1).  Padded canvas regions are
masked out of the attention and of the sine positional encoding's
normalization (the encoding measures position within the valid extent).
Dropout defaults to 0 (deterministic train step, no rng plumbing); DETR's
regularization at COCO scale comes mostly from the matching loss itself.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.hungarian import linear_sum_assignment
from ...ops.losses import iou_loss
from ...ops.nms import NMSResult
from ...utils.registry import BACKBONES, DETECTORS

Dtype = Any


def sine_position_encoding(valid: jnp.ndarray, d_model: int, temperature: float = 10000.0) -> jnp.ndarray:
    """DETR's 2-D sine encoding, normalized over the VALID extent.

    ``valid`` is (B, H, W) 1.0 inside the image, 0.0 on canvas padding; the
    cumulative-sum normalization then spans [~0, 2pi] over the real image
    regardless of how much padding the bucket added (reference semantics of
    DETR's PositionEmbeddingSine with its mask).
    """
    half = d_model // 2
    eps = 1e-6
    scale = 2.0 * math.pi
    y = jnp.cumsum(valid, axis=1)
    x = jnp.cumsum(valid, axis=2)
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = temperature ** (2.0 * (jnp.arange(half) // 2) / half)  # (half,)

    def embed(coord):
        pe = coord[..., None] / dim_t  # (B, H, W, half)
        return jnp.stack(
            [jnp.sin(pe[..., 0::2]), jnp.cos(pe[..., 1::2])], axis=-1
        ).reshape(coord.shape + (half,))

    return jnp.concatenate([embed(y), embed(x)], axis=-1)  # (B, H, W, d)


class _FFN(nn.Module):
    d_model: int
    dim_feedforward: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        return nn.Dense(self.d_model, dtype=self.dtype, name="fc2")(h)


class _EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, src, pos, key_mask):
        # post-norm, per the original DETR
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=self.dtype,
            name="self_attn",
        )(src + pos, src + pos, src, mask=key_mask)
        src = nn.LayerNorm(dtype=jnp.float32, name="norm1")(src + attn)
        ffn = _FFN(self.d_model, self.dim_feedforward, self.dtype, name="ffn")(src)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(src + ffn)


class _DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, tgt, query_pos, memory, pos, key_mask):
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=self.dtype,
            name="self_attn",
        )(tgt + query_pos, tgt + query_pos, tgt)
        tgt = nn.LayerNorm(dtype=jnp.float32, name="norm1")(tgt + sa)
        ca = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model, dtype=self.dtype,
            name="cross_attn",
        )(tgt + query_pos, memory + pos, memory, mask=key_mask)
        tgt = nn.LayerNorm(dtype=jnp.float32, name="norm2")(tgt + ca)
        ffn = _FFN(self.d_model, self.dim_feedforward, self.dtype, name="ffn")(tgt)
        return nn.LayerNorm(dtype=jnp.float32, name="norm3")(tgt + ffn)


@DETECTORS.register_module
class DETR(nn.Module):
    """backbone C5 -> 1x1 projection -> transformer -> class + box heads.

    Returns ``(cls_logits, boxes)`` with a leading decoder-layer axis
    (L, B, Q, num_classes + 1) / (L, B, Q, 4): the last slice is the
    prediction, earlier slices feed DETR's auxiliary losses.
    """

    backbone: Dict[str, Any]
    num_classes: int = 80
    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    num_queries: int = 100
    dtype: Optional[Dtype] = None

    def setup(self):
        self.backbone_mod = BACKBONES.build(dict(self.backbone), name="backbone")
        self.input_proj = nn.Dense(self.d_model, dtype=self.dtype, name="input_proj")
        self.query_embed = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (self.num_queries, self.d_model),
        )
        self.encoder_layers = [
            _EncoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                          self.dtype, name=f"encoder{i}")
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            _DecoderLayer(self.d_model, self.nhead, self.dim_feedforward,
                          self.dtype, name=f"decoder{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.decoder_norm = nn.LayerNorm(dtype=jnp.float32, name="decoder_norm")
        self.class_embed = nn.Dense(self.num_classes + 1, dtype=jnp.float32,
                                    name="class_embed")
        self.bbox_fc1 = nn.Dense(self.d_model, dtype=self.dtype, name="bbox_fc1")
        self.bbox_fc2 = nn.Dense(self.d_model, dtype=self.dtype, name="bbox_fc2")
        self.bbox_out = nn.Dense(4, dtype=jnp.float32, name="bbox_out")

    def __call__(
        self,
        images: jax.Array,  # (B, H, W, 3)
        img_shapes: Optional[jax.Array] = None,  # (B, 2) un-padded (h, w)
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        feats = self.backbone_mod(images, train=train)
        c5 = feats[-1] if isinstance(feats, (tuple, list)) else feats
        b, fh, fw, _ = c5.shape
        stride_h = images.shape[1] / fh
        stride_w = images.shape[2] / fw

        if img_shapes is None:
            valid = jnp.ones((b, fh, fw), jnp.float32)
        else:
            ys = (jnp.arange(fh, dtype=jnp.float32) + 0.5) * stride_h
            xs = (jnp.arange(fw, dtype=jnp.float32) + 0.5) * stride_w
            valid = (
                (ys[None, :, None] <= img_shapes[:, 0][:, None, None])
                & (xs[None, None, :] <= img_shapes[:, 1][:, None, None])
            ).astype(jnp.float32)

        pos = sine_position_encoding(valid, self.d_model)  # (B, fh, fw, d)
        src = self.input_proj(c5)
        L = fh * fw
        src = src.reshape(b, L, self.d_model)
        pos = pos.reshape(b, L, self.d_model).astype(src.dtype)
        # attention key mask: (B, 1, 1, L) — True = may attend
        key_mask = (valid.reshape(b, 1, 1, L) > 0.5)

        mem = src
        for layer in self.encoder_layers:
            mem = layer(mem, pos, key_mask)

        qpos = jnp.broadcast_to(
            self.query_embed[None], (b, self.num_queries, self.d_model)
        ).astype(mem.dtype)
        tgt = jnp.zeros_like(qpos)
        outs = []
        for layer in self.decoder_layers:
            tgt = layer(tgt, qpos, mem, pos, key_mask)
            outs.append(self.decoder_norm(tgt))

        hs = jnp.stack(outs)  # (L_dec, B, Q, d)
        cls_logits = self.class_embed(hs.astype(jnp.float32))
        h = nn.relu(self.bbox_fc1(hs))
        h = nn.relu(self.bbox_fc2(h))
        boxes = jax.nn.sigmoid(self.bbox_out(h).astype(jnp.float32))
        return cls_logits, boxes


@dataclasses.dataclass(frozen=True)
class DETRConfig:
    num_classes: int = 80
    num_queries: int = 100
    # matching-cost and loss weights (paper defaults)
    cls_weight: float = 1.0
    bbox_weight: float = 5.0
    giou_weight: float = 2.0
    eos_coef: float = 0.1  # no-object class weight in the CE
    aux_loss: bool = True
    # inference
    score_thr: float = 0.0
    max_detections: int = 100


def _gt_to_cxcywh(gt_boxes: jnp.ndarray, hw: jnp.ndarray) -> jnp.ndarray:
    """Inclusive xyxy -> normalized (cx, cy, w, h) via continuous edges."""
    x1, y1 = gt_boxes[:, 0], gt_boxes[:, 1]
    x2, y2 = gt_boxes[:, 2] + 1.0, gt_boxes[:, 3] + 1.0
    h, w = hw[0], hw[1]
    return jnp.stack(
        [(x1 + x2) / (2 * w), (y1 + y2) / (2 * h), (x2 - x1) / w, (y2 - y1) / h],
        axis=-1,
    )


def _cxcywh_to_xyxy_cont(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def _layer_loss(cfg: DETRConfig, logits, pred_boxes, gt_cxcywh, gt_labels, gt_valid, num_boxes):
    """Hungarian-matched set loss for ONE decoder layer, one image."""
    q = logits.shape[0]
    g = gt_cxcywh.shape[0]
    probs = jax.nn.softmax(jax.lax.stop_gradient(logits), axis=-1)  # (Q, C+1)
    pb = jax.lax.stop_gradient(pred_boxes)

    # cost matrix (G, Q): classification + L1 + GIoU (paper eq. 2)
    lab0 = jnp.clip(gt_labels - 1, 0, probs.shape[-1] - 2)  # 0-based classes
    cost_cls = -probs[:, lab0].T  # (G, Q)
    cost_l1 = jnp.sum(jnp.abs(gt_cxcywh[:, None, :] - pb[None, :, :]), axis=-1)
    gxy = _cxcywh_to_xyxy_cont(gt_cxcywh)
    pxy = _cxcywh_to_xyxy_cont(pb)
    # iou_loss(giou) = 1 - giou -> cost_giou = -giou = loss - 1
    cost_giou = (
        iou_loss(pxy[None, :, :], gxy[:, None, :], mode="giou", offset=0.0) - 1.0
    )
    cost = (
        cfg.cls_weight * cost_cls
        + cfg.bbox_weight * cost_l1
        + cfg.giou_weight * cost_giou
    )
    col4row = linear_sum_assignment(cost, row_valid=gt_valid)  # (G,) query ids, -1 invalid

    # classification targets: matched queries get their gt class, everything
    # else no-object (index C) — scatter the G matches into a (Q,) target
    # (invalid rows carry col -1: route them to an overflow slot and crop)
    no_obj = probs.shape[-1] - 1
    tgt = jnp.full((q + 1,), no_obj, jnp.int32)
    cols = jnp.where(gt_valid, col4row, q)
    tgt = tgt.at[cols].set(jnp.where(gt_valid, lab0, no_obj))[:q]
    logp = jax.nn.log_softmax(logits, axis=-1)
    w_cls = jnp.where(tgt == no_obj, cfg.eos_coef, 1.0)
    oh = jax.nn.one_hot(tgt, probs.shape[-1], dtype=jnp.float32)
    loss_cls = -jnp.sum(w_cls * jnp.sum(oh * logp, axis=-1)) / jnp.maximum(
        jnp.sum(w_cls), 1e-6
    )

    # (G, 4) — G is small; plain gather ok (invalid rows weighted out below)
    matched_pred = pred_boxes[jnp.clip(col4row, 0, q - 1)]
    vw = gt_valid.astype(jnp.float32)
    loss_l1 = jnp.sum(
        vw[:, None] * jnp.abs(matched_pred - gt_cxcywh)
    ) / num_boxes
    loss_giou = iou_loss(
        _cxcywh_to_xyxy_cont(matched_pred), gxy, weight=vw, mode="giou",
        offset=0.0, avg_factor=num_boxes,
    )
    return loss_cls, loss_l1, loss_giou


def detr_loss(
    cfg: DETRConfig,
    cls_logits: jax.Array,  # (L, B, Q, C+1)
    pred_boxes: jax.Array,  # (L, B, Q, 4) normalized cxcywh
    gt_boxes: jax.Array,  # (B, G, 4) inclusive xyxy
    gt_labels: jax.Array,  # (B, G) 1-based
    gt_valid: jax.Array,  # (B, G)
    img_shapes: jax.Array,  # (B, 2) un-padded (h, w)
) -> Dict[str, jax.Array]:
    n_layers = cls_logits.shape[0] if cfg.aux_loss else 1
    bsz = gt_boxes.shape[0]
    # normalize like the paper: by the TOTAL number of boxes in the batch
    num_boxes = jnp.maximum(jnp.sum(gt_valid.astype(jnp.float32)), 1.0) / bsz

    # vmap over BOTH decoder layers and images: all L'xB Hungarian matchings
    # run as one batched fixed-shape program (sequential layer loops cost 6x
    # wall-clock — measured 180 -> ~40 ms of the b8 step when batched)
    layer_logits = cls_logits[-n_layers:]  # (L', B, Q, C+1)
    layer_boxes = pred_boxes[-n_layers:]

    def one_image(i):
        gt_cxcywh = _gt_to_cxcywh(gt_boxes[i], img_shapes[i].astype(jnp.float32))
        gt_cxcywh = jnp.where(gt_valid[i][:, None], gt_cxcywh, 0.5)

        def one_layer(logits, boxes):
            return _layer_loss(
                cfg, logits, boxes, gt_cxcywh, gt_labels[i], gt_valid[i], num_boxes,
            )

        cls_l, l1_l, giou_l = jax.vmap(one_layer)(
            layer_logits[:, i], layer_boxes[:, i]
        )
        return jnp.sum(cls_l), jnp.sum(l1_l), jnp.sum(giou_l)

    cls_l, l1_l, giou_l = jax.vmap(one_image)(jnp.arange(bsz))
    loss_cls = jnp.mean(cls_l) * cfg.cls_weight
    loss_l1 = jnp.mean(l1_l) * cfg.bbox_weight
    loss_giou = jnp.mean(giou_l) * cfg.giou_weight
    return {
        "loss_cls": loss_cls,
        "loss_l1": loss_l1,
        "loss_giou": loss_giou,
        "loss": loss_cls + loss_l1 + loss_giou,
        "num_pos": jnp.mean(jnp.sum(gt_valid.astype(jnp.float32), -1)),
    }


def decode_detr(
    cfg: DETRConfig,
    cls_logits: jax.Array,  # (L, B, Q, C+1)
    pred_boxes: jax.Array,  # (L, B, Q, 4)
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> NMSResult:
    """Top-k over (query, class) pairs of the LAST decoder layer — no NMS
    (set prediction is one-to-one by construction)."""
    logits = cls_logits[-1]
    boxes_n = pred_boxes[-1]
    b, q, c1 = logits.shape
    c = c1 - 1
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[..., :c]

    def one_image(i):
        flat = probs[i].reshape(-1)  # (Q*C,)
        k = min(cfg.max_detections, flat.shape[0])
        top_s, top_idx = jax.lax.top_k(flat, k)
        qi = top_idx // c
        li = (top_idx % c).astype(jnp.int32)
        bx = _cxcywh_to_xyxy_cont(boxes_n[i][qi])  # normalized
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
        else:
            h = jnp.float32(1.0)
            w = jnp.float32(1.0)
        scale = jnp.stack([w, h, w, h])
        bx = bx * scale
        # back to the inclusive convention
        bx = jnp.concatenate([bx[:, :2], bx[:, 2:] - 1.0], axis=-1)
        if img_shapes is not None:
            x = jnp.clip(bx[:, 0::2], 0, w - 1.0)
            y = jnp.clip(bx[:, 1::2], 0, h - 1.0)
            bx = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        if scale_factors is not None:
            bx = bx / scale_factors[i]
        valid = top_s > cfg.score_thr
        qi = qi.astype(jnp.int32)
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
