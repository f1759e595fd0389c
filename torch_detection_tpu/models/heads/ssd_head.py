"""SSD multibox head: per-level 3x3 convs -> (A_l*(C+1) cls, A_l*4 reg).

Third detector family (with RetinaNet and the R-CNNs): the classic
VGG16-based single shot detector the reference's VGG backbone
(``models/backbone/vgg.py`` in TCGGroup/Torch_Detection) historically
pairs with — the reference itself never built a detector tier
(SURVEY.md §2 #33 [ABSENT]).  Unlike the RetinaHead the conv weights are
per-level (feature channels differ) and classification is softmax over
C+1 with background class 0.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
from flax import linen as nn

from ...utils.registry import HEADS

Dtype = Any


@HEADS.register_module
class SSDHead(nn.Module):
    num_classes: int = 80  # foreground classes; logits have C+1 with bg=0
    in_channels: Tuple[int, ...] = (512, 1024, 512, 256, 256, 256)
    anchors_per_level: Tuple[int, ...] = (4, 6, 6, 6, 4, 4)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], train: bool = False
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        assert len(feats) == len(self.anchors_per_level)
        cls_out, reg_out = [], []
        for lvl, (f, a) in enumerate(zip(feats, self.anchors_per_level)):
            cls_out.append(
                nn.Conv(
                    a * (self.num_classes + 1), (3, 3), padding=1,
                    dtype=self.dtype, name=f"cls_conv{lvl}",
                )(f)
            )
            reg_out.append(
                nn.Conv(
                    a * 4, (3, 3), padding=1, dtype=self.dtype,
                    name=f"reg_conv{lvl}",
                )(f)
            )
        return tuple(cls_out), tuple(reg_out)
