"""MobileNet v1 / v2 backbones (flax.linen, NHWC).

Parity surface (TCGGroup/Torch_Detection):
  * v1 ``models/backbone/mobilenet.py``: depthwise-separable blocks
    (``Conv_dw_pw:9-50``), width multipliers 0.25/0.5/0.75/1.0 with the
    per-stage (planes, blocks) table (``:104-109``), stem 3x3 s2.
  * v2 ``models/backbone/mobilenetv2.py``: inverted residual LinearBottleNeck
    with relu6 (``:9-56``), the (expansion, planes, blocks, stride, dilation)
    table (``:108-114``), final 1x1 to 1280 (``:161-163``).

Fixed (SURVEY.md appendix): v1's pointwise branch reusing the depthwise norm
(``mobilenet.py:47``), and v2's broken residual condition (``&`` precedence +
unset attributes, ``mobilenetv2.py:54``) — here the residual is applied iff
stride == 1 and in/out channels match, the published architecture.

Depthwise convs map to ``feature_group_count == channels``; XLA lowers these
to VPU elementwise-window ops rather than MXU matmuls, which is the correct
cost model for these nets.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..layers import ConvModule

Dtype = Any

MOBILENET_SETTINGS = {
    0.25: ((16, 32, 64, 128, 256), (1, 2, 2, 6, 2)),
    0.5: ((32, 64, 128, 256, 512), (1, 2, 2, 6, 2)),
    0.75: ((48, 96, 172, 384, 768), (1, 2, 2, 6, 2)),
    1.0: ((64, 128, 256, 512, 1024), (1, 2, 2, 6, 2)),
}

# (expansion, out_planes, num_blocks, stride, dilation)
MOBILENETV2_SETTINGS = (
    (1, 16, 1, 1, 1),
    (6, 24, 2, 2, 1),
    (6, 32, 3, 2, 1),
    (6, 64, 4, 2, 1),
    (6, 96, 3, 1, 1),
    (6, 160, 3, 2, 1),
    (6, 320, 1, 1, 1),
)


class DepthwiseSeparable(nn.Module):
    """3x3 depthwise (+norm+relu) -> 1x1 pointwise (+norm+relu)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    act: str = "relu"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = self.norm_cfg or {"type": "FrozenBN"}
        in_ch = x.shape[-1]
        x = ConvModule(
            in_ch, 3, stride=self.stride, padding=self.dilation,
            dilation=self.dilation, groups=in_ch, norm_cfg=norm, act=self.act,
            dtype=self.dtype, name="dw",
        )(x, train=train)
        return ConvModule(
            self.planes, 1, norm_cfg=norm, act=self.act, dtype=self.dtype, name="pw",
        )(x, train=train)


@BACKBONES.register_module
class MobileNet(nn.Module):
    """MobileNet v1: stem 3x3 s2 + 5 stages of depthwise-separable blocks."""

    width_multi: float = 1.0
    num_stages: int = 5
    strides: Tuple[int, ...] = (1, 2, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1, 1)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3, 4)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        if self.width_multi not in MOBILENET_SETTINGS:
            raise KeyError(f"unsupported width_multi {self.width_multi}")
        stage_planes, stage_blocks = MOBILENET_SETTINGS[self.width_multi]
        stage_planes = stage_planes[: self.num_stages]
        stage_blocks = stage_blocks[: self.num_stages]
        assert max(self.out_indices) < self.num_stages
        norm = self.norm_cfg or {"type": "FrozenBN"}

        x = ConvModule(
            round(32 * self.width_multi), 3, stride=2, padding=1,
            norm_cfg=norm, act="relu", dtype=self.dtype, name="stem",
        )(x, train=train)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for i, (planes, blocks) in enumerate(zip(stage_planes, stage_blocks)):
            for j in range(blocks):
                x = DepthwiseSeparable(
                    planes,
                    stride=self.strides[i] if j == 0 else 1,
                    dilation=self.dilations[i],
                    norm_cfg=norm,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class InvertedResidual(nn.Module):
    """MobileNet v2 LinearBottleNeck: 1x1 expand (relu6) -> 3x3 dw (relu6) ->
    1x1 project (linear), residual iff stride 1 and channels match."""

    planes: int
    expansion: int = 6
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = self.norm_cfg or {"type": "FrozenBN"}
        in_ch = x.shape[-1]
        hidden = in_ch * self.expansion
        out = x
        if self.expansion != 1:
            out = ConvModule(
                hidden, 1, norm_cfg=norm, act="relu6", dtype=self.dtype, name="expand",
            )(out, train=train)
        out = ConvModule(
            hidden, 3, stride=self.stride, padding=self.dilation,
            dilation=self.dilation, groups=hidden, norm_cfg=norm, act="relu6",
            dtype=self.dtype, name="dw",
        )(out, train=train)
        out = ConvModule(
            self.planes, 1, norm_cfg=norm, act=None, dtype=self.dtype, name="project",
        )(out, train=train)
        if self.stride == 1 and in_ch == self.planes:
            out = out + x
        return out


@BACKBONES.register_module
class MobileNetV2(nn.Module):
    num_stages: int = 7
    out_indices: Tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6)
    frozen_stages: int = -1
    with_last_conv: bool = False  # append the 1x1 -> 1280 on the last output
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        assert 1 <= self.num_stages <= 7
        assert max(self.out_indices) < self.num_stages
        norm = self.norm_cfg or {"type": "FrozenBN"}
        stages = MOBILENETV2_SETTINGS[: self.num_stages]

        x = ConvModule(
            32, 3, stride=2, padding=1, norm_cfg=norm, act="relu6",
            dtype=self.dtype, name="stem",
        )(x, train=train)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for i, (expansion, planes, blocks, stride, dilation) in enumerate(stages):
            for j in range(blocks):
                x = InvertedResidual(
                    planes,
                    expansion=expansion,
                    stride=stride if j == 0 else 1,
                    dilation=dilation,
                    norm_cfg=norm,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                if i == self.num_stages - 1 and self.with_last_conv:
                    x = ConvModule(
                        1280, 1, norm_cfg=norm, act="relu6",
                        dtype=self.dtype, name="last_conv",
                    )(x, train=train)
                outs.append(x)
        return tuple(outs)
