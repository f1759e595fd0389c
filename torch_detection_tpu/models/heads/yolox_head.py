"""YOLOX decoupled head: per-level stem + separate cls / reg+obj towers.

Ge et al., YOLOX 2021.  Anchor-free, one prediction per location: class
scores (C), box offsets (4: xy offset within the cell + log wh in stride
units), and an objectness logit.  Each level carries its own parameters
(the official layout); towers are 2 convs with SiLU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from ..inits import bias_init_with_prob
from ..layers import ConvModule

Dtype = Any


@HEADS.register_module
class YOLOXHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 128
    feat_channels: int = 128
    stacked_convs: int = 2
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], train: bool = False
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        norm_cfg = dict(self.norm_cfg) if self.norm_cfg else {"type": "FrozenBN"}
        prior_bias = lambda key, shape, dtype=jnp.float32: jnp.full(  # noqa: E731
            shape, bias_init_with_prob(0.01), dtype
        )
        cls_scores, bbox_preds, objectnesses = [], [], []
        for lvl, f in enumerate(feats):
            x = ConvModule(self.feat_channels, 1, norm_cfg=norm_cfg, act="silu",
                           dtype=self.dtype, name=f"stem{lvl}")(f, train=train)
            c = x
            for i in range(self.stacked_convs):
                c = ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm_cfg,
                               act="silu", dtype=self.dtype,
                               name=f"cls_tower{lvl}_{i}")(c, train=train)
            r = x
            for i in range(self.stacked_convs):
                r = ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm_cfg,
                               act="silu", dtype=self.dtype,
                               name=f"reg_tower{lvl}_{i}")(r, train=train)
            cls_scores.append(nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype, bias_init=prior_bias,
                name=f"cls_out{lvl}")(c))
            bbox_preds.append(nn.Conv(4, (1, 1), dtype=self.dtype,
                                      name=f"reg_out{lvl}")(r))
            objectnesses.append(nn.Conv(
                1, (1, 1), dtype=self.dtype, bias_init=prior_bias,
                name=f"obj_out{lvl}")(r))
        return tuple(cls_scores), tuple(bbox_preds), tuple(objectnesses)
