"""YOLOv3 head: per-level 3x3 bridge conv + 1x1 prediction conv.

Absent from the reference (TCGGroup/Torch_Detection never built a head tier,
SURVEY.md §2 #33); follows the canonical YOLOv3 layout: for each of the three
neck maps (channels 512/256/128 at strides 32/16/8) a 3x3 ConvModule doubles
the width, then a biased 1x1 conv emits ``A * (5 + C)`` channels per cell —
per anchor: [tx, ty, tw, th, objectness, C class logits].

The objectness bias is seeded with ``bias_init_with_prob(0.01)`` so the
initial conf loss over ~20k cells is small (same stabilizer the RetinaHead
uses for its focal prior, reference ``models/utils/inits.py:49-52``).
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
class YOLOV3Head(nn.Module):
    """Outputs per level: (B, H, W, A*(5+C)) raw prediction maps,
    coarse->fine to match ``YOLOV3Neck``."""

    num_classes: int = 80
    in_channels: Tuple[int, ...] = (512, 256, 128)
    out_channels: Tuple[int, ...] = (1024, 512, 256)
    anchors_per_level: int = 3
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], train: bool = False
    ) -> Tuple[jax.Array, ...]:
        assert len(feats) == len(self.in_channels)
        norm_cfg = dict(self.norm_cfg) if self.norm_cfg else {"type": "FrozenBN"}
        a = self.anchors_per_level
        c_pred = a * (5 + self.num_classes)

        def pred_bias(key, shape, dtype=jnp.float32):
            # objectness channel (index 4 of each anchor's 5+C slot) gets the
            # low-prior bias; everything else starts at zero
            bias = jnp.zeros(shape, dtype)
            prior = bias_init_with_prob(0.01)
            idx = jnp.arange(shape[0]) % (5 + self.num_classes) == 4
            return jnp.where(idx, prior, bias)

        outs = []
        for lvl, f in enumerate(feats):
            y = ConvModule(
                self.out_channels[lvl], kernel_size=3, padding=1,
                norm_cfg=norm_cfg, act="leaky_relu", dtype=self.dtype,
                name=f"bridge{lvl}",
            )(f, train=train)
            y = nn.Conv(
                c_pred, (1, 1), use_bias=True, bias_init=pred_bias,
                dtype=self.dtype, name=f"pred{lvl}",
            )(y)
            outs.append(y)
        return tuple(outs)
