"""Darknet-53 backbone (YOLOv3 trunk), NHWC flax.

Eighth-family backbone.  The reference (TCGGroup/Torch_Detection) ships no
Darknet — its backbone zoo stops at ResNet/VGG/Mobile/ShuffleNet
(``models/backbone/``, SURVEY.md §2 #21-#29) — so this follows the canonical
YOLOv3 geometry: a 3x3/32 stem, then five stages of [3x3 stride-2 downsample
conv, N x residual block] with N = (1, 2, 8, 8, 4) and channel widths
(64, 128, 256, 512, 1024).  Each residual block is a 1x1 squeeze to half
width followed by a 3x3 expand back, with an identity add.  All convs are
ConvModule conv+BN+LeakyReLU(0.1) (Darknet convention).

TPU notes: every conv is a dense NHWC/HWIO MXU conv (no grouping); widths are
multiples of 64 from stage 2 on, so lane tiling is clean.  ``stages`` is a
static tuple -> the python loops unroll at trace time into one XLA program.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..layers import ConvModule

Dtype = Any

# depth -> per-stage residual-block counts
ARCH_SETTINGS = {53: (1, 2, 8, 8, 4)}


class DarkBlock(nn.Module):
    """1x1 half-width squeeze -> 3x3 expand -> identity add."""

    channels: int  # block io width
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = self.channels // 2
        y = ConvModule(
            half, kernel_size=1, padding=0, norm_cfg=self.norm_cfg,
            act="leaky_relu", dtype=self.dtype, name="conv1",
        )(x, train=train)
        y = ConvModule(
            self.channels, kernel_size=3, padding=1, norm_cfg=self.norm_cfg,
            act="leaky_relu", dtype=self.dtype, name="conv2",
        )(y, train=train)
        return x + y


@BACKBONES.register_module
class Darknet(nn.Module):
    """Darknet backbone.

    ``out_indices`` are stage indices (0-based over the five downsampling
    stages); the YOLOv3 pairing is ``(2, 3, 4)`` -> (256 @ /8, 512 @ /16,
    1024 @ /32).  ``stages`` overrides the block counts (tests use tiny
    stacks); ``base_channels`` scales every width (default 32).
    """

    depth: int = 53
    out_indices: Tuple[int, ...] = (2, 3, 4)
    stages: Optional[Tuple[int, ...]] = None
    base_channels: int = 32
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        norm_cfg = dict(self.norm_cfg) if self.norm_cfg else {"type": "FrozenBN"}
        blocks = self.stages if self.stages is not None else ARCH_SETTINGS[self.depth]
        c0 = self.base_channels
        x = ConvModule(
            c0, kernel_size=3, padding=1, norm_cfg=norm_cfg, act="leaky_relu",
            dtype=self.dtype, name="conv1",
        )(x, train=train)
        outs = []
        for i, n_blocks in enumerate(blocks):
            width = c0 * 2 ** (i + 1)
            x = ConvModule(
                width, kernel_size=3, stride=2, padding=1, norm_cfg=norm_cfg,
                act="leaky_relu", dtype=self.dtype, name=f"down{i}",
            )(x, train=train)
            for j in range(n_blocks):
                x = DarkBlock(
                    width, norm_cfg=norm_cfg, dtype=self.dtype,
                    name=f"stage{i}_block{j}",
                )(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
