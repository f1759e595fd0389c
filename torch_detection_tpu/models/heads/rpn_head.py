"""Region Proposal Network head + fixed-shape proposal generation.

Two-stage tier (beyond the reference, whose datasets already carry proposal
plumbing at ``base_dataset.py:100-105`` but whose model tier was never
built).  TPU-first: proposals are generated with per-level top-k + one
class-agnostic fixpoint NMS, padded to a fixed ``post_nms_top_k`` with a
validity mask — the RoI stage downstream never sees a dynamic shape.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.boxes import delta2bbox
from ...ops.nms import nms
from ...utils.registry import HEADS

Dtype = Any


@HEADS.register_module
class RPNHead(nn.Module):
    """3x3 conv -> 1x1 objectness (A) + 1x1 deltas (A*4), shared across levels."""

    in_channels: int = 256
    feat_channels: int = 256
    num_base_anchors: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Tuple[jax.Array, ...], train: bool = False
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1, dtype=self.dtype, name="rpn_conv")
        cls_out = nn.Conv(self.num_base_anchors, (1, 1), dtype=self.dtype, name="rpn_cls")
        reg_out = nn.Conv(self.num_base_anchors * 4, (1, 1), dtype=self.dtype, name="rpn_reg")
        scores, deltas = [], []
        for f in feats:
            h = nn.relu(conv(f))
            scores.append(cls_out(h))
            deltas.append(reg_out(h))
        return tuple(scores), tuple(deltas)


class Proposals(NamedTuple):
    boxes: jax.Array  # (B, P, 4)
    scores: jax.Array  # (B, P)
    valid: jax.Array  # (B, P) bool


@dataclasses.dataclass(frozen=True)
class ProposalConfig:
    pre_nms_per_level: int = 1000
    post_nms_top_k: int = 1000
    nms_iou_thr: float = 0.7
    min_box_size: float = 0.0
    target_means: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    target_stds: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)
    # candidate pool fed to the cross-level NMS; slots freed by suppression
    # backfill from here, so > post_nms_top_k recovers proposal recall.
    # None = 2 * post_nms_top_k (bounds the (K,K) IoU matrix; the full
    # 5-level pool would be ~10k candidates -> 400 MB of IoU per image).
    nms_pool_k: Optional[int] = None
    # jax.lax.approx_max_k for the per-level pre-NMS top-k (~2.5x on the
    # stride-4 level); misses are tail-rank-skewed, recall-neutral in practice
    approx_top_k: bool = False

    @property
    def pool_k(self) -> int:
        return self.nms_pool_k if self.nms_pool_k is not None else 2 * self.post_nms_top_k


def generate_proposals(
    cfg: ProposalConfig,
    anchor_generator,
    rpn_scores: Sequence[jax.Array],  # per level (B, H, W, A)
    rpn_deltas: Sequence[jax.Array],  # per level (B, H, W, A*4)
    img_shapes: Optional[jax.Array] = None,  # (B, 2)
) -> Proposals:
    """Decode + per-level top-k + class-agnostic NMS -> fixed (B, P) slate."""
    featmap_sizes = [tuple(s.shape[1:3]) for s in rpn_scores]
    level_anchors = anchor_generator.grid_anchors(featmap_sizes)
    b = rpn_scores[0].shape[0]

    cand_scores, cand_boxes = [], []
    for lvl, (s_l, d_l) in enumerate(zip(rpn_scores, rpn_deltas)):
        # f32 before sort/gather: conv-produced bf16 tensors fed straight
        # into gather/sort kernels fault the current TPU runtime
        s = s_l.reshape(b, -1).astype(jnp.float32)  # (B, Nl)
        d = d_l.reshape(b, -1, 4).astype(jnp.float32)
        n_l = s.shape[1]
        k = min(cfg.pre_nms_per_level, n_l)
        if cfg.approx_top_k and k < n_l:
            top_s, idx = jax.lax.approx_max_k(s, k)
        else:
            top_s, idx = jax.lax.top_k(s, k)
        top_d = jnp.take_along_axis(d, idx[..., None], axis=1)
        top_a = level_anchors[lvl][idx]  # (B, k, 4)
        boxes = delta2bbox(top_a, top_d, cfg.target_means, cfg.target_stds)
        cand_scores.append(top_s)
        cand_boxes.append(boxes)

    scores = jax.nn.sigmoid(jnp.concatenate(cand_scores, axis=1))  # (B, M)
    boxes = jnp.concatenate(cand_boxes, axis=1)  # (B, M, 4)

    def one_image(i):
        bx = boxes[i]
        sc = scores[i]
        if img_shapes is not None:
            h, w = img_shapes[i, 0], img_shapes[i, 1]
            x = jnp.clip(bx[:, 0::2], 0, w - 1.0)
            y = jnp.clip(bx[:, 1::2], 0, h - 1.0)
            bx = jnp.stack([x[:, 0], y[:, 0], x[:, 1], y[:, 1]], axis=-1)
        if cfg.min_box_size > 0:
            ok = ((bx[:, 2] - bx[:, 0]) >= cfg.min_box_size) & (
                (bx[:, 3] - bx[:, 1]) >= cfg.min_box_size
            )
            sc = jnp.where(ok, sc, 0.0)
        res = nms(
            bx, sc, iou_thr=cfg.nms_iou_thr, max_out=cfg.post_nms_top_k,
            pre_top_k=cfg.pool_k,
        )
        return res.boxes, res.scores, res.valid

    pb, ps, pv = jax.vmap(one_image)(jnp.arange(b))
    return Proposals(pb, ps, pv)
