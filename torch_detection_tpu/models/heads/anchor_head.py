"""Anchor-based dense detection head (RetinaNet-style), flax.linen NHWC.

The reference never implemented heads (``models/__init__.py`` empty; SURVEY.md
§2 #33 [ABSENT -> must build]); this design follows the RetinaNet anchor-head
contract its lineage (mmdetection) implies, built TPU-first:

  * conv towers are shared across pyramid levels (one set of params applied
    per level) — each application is one large NHWC conv on the MXU;
  * per-level outputs stay (B, H, W, A*C) until the loss/decode step flattens
    them to the anchor-major layout matching ``ops.anchors.grid_anchors``;
  * target assignment is the fixed-shape masked MaxIoU assigner — no dynamic
    shapes anywhere, so loss and inference jit into single programs.

``bias_init_with_prob(0.01)`` seeds the cls conv bias (focal-loss prior,
reference ``models/utils/inits.py:49-52``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from ..inits import bias_init_with_prob, normal_init
from ..layers import ConvModule

Dtype = Any


@HEADS.register_module
class RetinaHead(nn.Module):
    """Classification + box-regression towers applied to each FPN level.

    Outputs per level: cls (B, H, W, A*num_classes) logits and reg
    (B, H, W, A*4) deltas.  ``num_classes`` counts foreground classes only
    (sigmoid head — no background column).
    """

    num_classes: int
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_base_anchors: int = 9
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Tuple[jax.Array, ...], train: bool = False
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        cls_convs = [
            ConvModule(
                self.feat_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act="relu", use_bias=True, dtype=self.dtype, name=f"cls_conv{i}",
            )
            for i in range(self.stacked_convs)
        ]
        reg_convs = [
            ConvModule(
                self.feat_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act="relu", use_bias=True, dtype=self.dtype, name=f"reg_conv{i}",
            )
            for i in range(self.stacked_convs)
        ]
        cls_out = nn.Conv(
            self.num_base_anchors * self.num_classes, (3, 3), padding=1,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            kernel_init=normal_init(0.01),
            dtype=self.dtype, name="cls_out",
        )
        reg_out = nn.Conv(
            self.num_base_anchors * 4, (3, 3), padding=1,
            kernel_init=normal_init(0.01),
            dtype=self.dtype, name="reg_out",
        )

        cls_scores, bbox_preds = [], []
        for feat in feats:
            c = feat
            r = feat
            for conv in cls_convs:
                c = conv(c, train=train)
            for conv in reg_convs:
                r = conv(r, train=train)
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r))
        return tuple(cls_scores), tuple(bbox_preds)


def flatten_head_outputs(
    cls_scores: Sequence[jax.Array],
    bbox_preds: Sequence[jax.Array],
    num_classes: int,
) -> Tuple[jax.Array, jax.Array]:
    """Flatten per-level (B,H,W,A*C)/(B,H,W,A*4) to (B, sum HWA, C) / (..., 4)
    in the same anchor-major order as ``AnchorGenerator.flat_anchors``."""
    b = cls_scores[0].shape[0]
    flat_cls = jnp.concatenate(
        [s.reshape(b, -1, num_classes) for s in cls_scores], axis=1
    )
    flat_reg = jnp.concatenate([p.reshape(b, -1, 4) for p in bbox_preds], axis=1)
    return flat_cls, flat_reg
