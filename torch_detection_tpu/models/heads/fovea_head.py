"""FoveaBox head: anchor-free towers, class + log-space box branches.

Thirteenth detector family (FoveaBox, Kong et al. 2019) — the reference
(TCGGroup/Torch_Detection) has no detector tier at all (SURVEY.md §2 #33),
so like the other families this is new TPU-first scope.  Shares the
FPN/backbone zoo; the head mirrors FCOSHead's shared 4-conv towers but has
no centerness branch and no per-level scale parameters: the regression
conv emits 4 log-space offsets that decode against a per-level
``base_edge`` constant (``x1 = px - base * exp(t0)`` …), so the raw head
is scale-free by construction.
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
class FoveaHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    norm: bool = True  # GN(32) in the towers, matching the anchor-free family
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
        reg_out = nn.Conv(4, (3, 3), padding=1, dtype=self.dtype, name="reg_out")

        cls_scores, bbox_preds = [], []
        for f in feats:
            c = f
            for m in cls_tower:
                c = m(c, train=train)
            r = f
            for m in reg_tower:
                r = m(r, train=train)
            cls_scores.append(cls_out(c))
            bbox_preds.append(reg_out(r))
        return tuple(cls_scores), tuple(bbox_preds)
