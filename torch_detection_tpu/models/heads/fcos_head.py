"""FCOS head: anchor-free towers + per-level scales + centerness branch.

Fourth detector family (after RetinaNet, the R-CNNs, and SSD) — the
anchor-free point-based design (FCOS, Tian et al. 2019), absent from the
reference (TCGGroup/Torch_Detection has no detector tier; SURVEY.md §2
#33).  Shares the FPN/backbone zoo; the head mirrors RetinaHead's shared
4-conv towers (GN-normalized per the paper) with:

  * a classification conv (C channels, focal-bias init),
  * a regression conv (4 ltrb distances) scaled by a learnable per-level
    scalar and mapped through ``exp`` at decode/loss time,
  * a centerness conv (1 channel) hanging off the regression tower.
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
class FCOSHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    norm: bool = True  # GN(32) in the towers, per the paper
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], train: bool = False
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
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
        reg_out = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype, name="reg_out")
        ctr_out = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype, name="ctr_out")
        scales = self.param(
            "scales", lambda key, shape: jnp.ones(shape, jnp.float32), (len(feats),)
        )

        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, f in enumerate(feats):
            c = f
            for m in cls_tower:
                c = m(c, train=train)
            r = f
            for m in reg_tower:
                r = m(r, train=train)
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r) * scales[lvl].astype(f.dtype))
            centernesses.append(ctr_out(r))
        return tuple(cls_scores), tuple(bbox_preds), tuple(centernesses)
