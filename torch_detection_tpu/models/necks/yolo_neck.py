"""YOLOv3 neck: top-down detection blocks with upsample+concat fusion.

The reference (TCGGroup/Torch_Detection) has no YOLO tier (its neck zoo is
FPN/PAFPN only, ``models/necks/``); this follows the canonical YOLOv3 shape:
for the coarsest map run a 5-conv DetectionBlock; then repeatedly 1x1-reduce,
nearest-2x upsample, channel-concat with the next finer backbone map, and run
another DetectionBlock.  Outputs are ordered coarse->fine (strides 32, 16, 8)
— the level order the YOLO anchor geometry in ``ops/anchors.py`` uses.

TPU notes: concat on the channel (lane) axis keeps the fused tensor MXU
friendly (384/768 channels); upsample is the broadcast-reshape
``resize_nearest_2x`` (no gather).  All convs are dense NHWC.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import NECKS
from ..layers import ConvModule, resize_nearest_2x

Dtype = Any


class DetectionBlock(nn.Module):
    """5-conv block: 1x1 c, 3x3 2c, 1x1 c, 3x3 2c, 1x1 c (BN+LeakyReLU)."""

    out_channels: int
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = self.out_channels
        spec = [(c, 1), (2 * c, 3), (c, 1), (2 * c, 3), (c, 1)]
        for i, (width, k) in enumerate(spec):
            x = ConvModule(
                width, kernel_size=k, padding=k // 2, norm_cfg=self.norm_cfg,
                act="leaky_relu", dtype=self.dtype, name=f"conv{i + 1}",
            )(x, train=train)
        return x


@NECKS.register_module
class YOLOV3Neck(nn.Module):
    """in: backbone maps fine->coarse (C3, C4, C5); out: (P5, P4, P3)."""

    in_channels: Tuple[int, ...] = (256, 512, 1024)  # fine -> coarse
    out_channels: Tuple[int, ...] = (512, 256, 128)  # coarse -> fine
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        assert len(feats) == len(self.in_channels)
        norm_cfg = dict(self.norm_cfg) if self.norm_cfg else {"type": "FrozenBN"}
        # coarse -> fine traversal
        inputs = list(feats)[::-1]  # (C5, C4, C3)
        outs = []
        x = DetectionBlock(
            self.out_channels[0], norm_cfg=norm_cfg, dtype=self.dtype,
            name="detect1",
        )(inputs[0], train=train)
        outs.append(x)
        for i, finer in enumerate(inputs[1:]):
            c = self.out_channels[i + 1]
            y = ConvModule(
                c, kernel_size=1, padding=0, norm_cfg=norm_cfg,
                act="leaky_relu", dtype=self.dtype, name=f"reduce{i + 1}",
            )(x, train=train)
            y = resize_nearest_2x(y)
            y = jnp.concatenate([y, finer], axis=-1)
            x = DetectionBlock(
                c, norm_cfg=norm_cfg, dtype=self.dtype, name=f"detect{i + 2}",
            )(y, train=train)
            outs.append(x)
        return tuple(outs)
