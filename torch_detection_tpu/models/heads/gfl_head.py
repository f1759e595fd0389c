"""GFL head: shared towers + joint quality-classification + distributional
box regression.

Eleventh detector family (Generalized Focal Loss, Li et al., NeurIPS 2020),
beyond the reference's aspirations (TCGGroup/Torch_Detection has no detector
tier — ``models/__init__.py`` empty, SURVEY.md §2 #33 [ABSENT]).  Two ideas
on top of the ATSS skeleton:

  * the classification branch predicts the localization QUALITY jointly with
    the class (a sigmoid score supervised with the decoded box's IoU — no
    separate centerness branch), trained with the Quality Focal Loss;
  * the regression branch predicts a discrete DISTRIBUTION over ``reg_max+1``
    bins for each of the four ltrb distances (in stride units); the box is
    the distribution's expectation, and the Distribution Focal Loss sharpens
    probability mass around the target.

TPU notes: the general distribution decodes as one softmax + one (4,
reg_max+1)x(reg_max+1,) contraction per location — dense, fixed-shape, and
fully fused by XLA.  Tower layout matches FCOSHead so the same GN towers /
per-level scale machinery applies.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from ..inits import bias_init_with_prob

Dtype = Any


@HEADS.register_module
class GFLHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    reg_max: int = 16  # bins per side = reg_max + 1
    norm: bool = True  # GN(32) towers, per the paper
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], train: bool = False
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        norm_cfg = dict(type="GN") if self.norm else None
        from ..layers import ConvModule

        cls_tower = [
            ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm_cfg,
                       act="relu", dtype=self.dtype, name=f"cls_tower{i}")
            for i in range(self.stacked_convs)
        ]
        reg_tower = [
            ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm_cfg,
                       act="relu", dtype=self.dtype, name=f"reg_tower{i}")
            for i in range(self.stacked_convs)
        ]
        cls_out = nn.Conv(
            self.num_classes, (3, 3), padding=1, dtype=self.dtype,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.full(
                shape, bias_init_with_prob(0.01), dtype
            ),
            name="cls_out",
        )
        reg_out = nn.Conv(
            4 * (self.reg_max + 1), (3, 3), padding=1, dtype=self.dtype,
            name="reg_out",
        )
        scales = self.param(
            "scales", lambda key, shape: jnp.ones(shape, jnp.float32), (len(feats),)
        )

        cls_scores, bbox_preds = [], []
        for lvl, f in enumerate(feats):
            c = f
            for m in cls_tower:
                c = m(c, train=train)
            r = f
            for m in reg_tower:
                r = m(r, train=train)
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r) * scales[lvl].astype(f.dtype))
        return tuple(cls_scores), tuple(bbox_preds)
