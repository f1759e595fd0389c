"""ShuffleNet v1 / v2 backbones (flax.linen, NHWC).

Parity surface (TCGGroup/Torch_Detection):
  * v1 ``models/backbone/shufflenet.py``: grouped 1x1 + channel shuffle +
    depthwise 3x3 bottleneck, no relu after dw (``:55-80``); stride-2 blocks
    concat an AvgPool(3, s2) residual (``:72-74, 92``); no grouped conv for
    the first 1x1 of stage 2 (``:26``); groups in {1,2,3,4,8} with the
    channel table (``:142-148``).
  * v2 ``models/backbone/shufflenetv2.py``: channel-split dual branch
    (``InvertedLayer:11-60``), concat + shuffle (``:92-100``); width
    multipliers 0.5/1.0/1.5/2.0 (``:166-171``); final 1x1 conv5 to 1024/2048
    (``:229-232``).

Fixed (SURVEY.md appendix): the reference's ShuffleLayer float-division and
ChannelSplit height-axis bugs (``layers.py:170,179``); v2 stride-2 blocks
here feed the FULL input to both branches (the published design) instead of
splitting first.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..layers import (
    ConvModule,
    avg_pool_torch,
    channel_shuffle,
    channel_split,
    max_pool_same_torch,
)

Dtype = Any

SHUFFLENET_SETTINGS = {
    1: ((144, 288, 576), (4, 8, 4)),
    2: ((200, 400, 800), (4, 8, 4)),
    3: ((240, 480, 960), (4, 8, 4)),
    4: ((272, 544, 1088), (4, 8, 4)),
    8: ((384, 768, 1536), (4, 8, 4)),
}

SHUFFLENETV2_SETTINGS = {
    0.5: ((48, 96, 192, 1024), (4, 8, 4)),
    1.0: ((116, 232, 464, 1024), (4, 8, 4)),
    1.5: ((176, 352, 704, 1024), (4, 8, 4)),
    2.0: ((244, 488, 976, 2048), (4, 8, 4)),
}


class ShuffleBottleneck(nn.Module):
    """v1 block: grouped 1x1 -> shuffle -> dw 3x3 (no relu) -> grouped 1x1;
    stride 2 concats an avg-pooled residual, stride 1 adds it."""

    outplanes: int
    groups: int
    first_group: bool = True  # False for the first block of stage 2
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = self.norm_cfg or {"type": "FrozenBN"}
        planes = self.outplanes // self.expansion
        out_ch = self.outplanes - x.shape[-1] if self.stride == 2 else self.outplanes
        g1 = self.groups if self.first_group else 1

        out = ConvModule(
            planes, 1, groups=g1, norm_cfg=norm, act="relu", dtype=self.dtype, name="conv1",
        )(x, train=train)
        out = channel_shuffle(out, g1) if g1 > 1 else out
        out = ConvModule(
            planes, 3, stride=self.stride, padding=self.dilation,
            dilation=self.dilation, groups=planes, norm_cfg=norm, act=None,
            dtype=self.dtype, name="conv2",
        )(out, train=train)
        out = ConvModule(
            out_ch, 1, groups=self.groups, norm_cfg=norm, act=None,
            dtype=self.dtype, name="conv3",
        )(out, train=train)

        if self.stride == 2:
            residual = avg_pool_torch(x, window=3, stride=2, padding=1)
            out = jnp.concatenate([residual, out], axis=-1)
        else:
            out = out + x
        return nn.relu(out)


@BACKBONES.register_module
class ShuffleNet(nn.Module):
    groups: int = 3
    num_stages: int = 3
    strides: Tuple[int, ...] = (2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1)
    out_indices: Tuple[int, ...] = (0, 1, 2)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        if self.groups not in SHUFFLENET_SETTINGS:
            raise KeyError(f"unsupported groups {self.groups}")
        stage_planes, stage_blocks = SHUFFLENET_SETTINGS[self.groups]
        stage_planes = stage_planes[: self.num_stages]
        stage_blocks = stage_blocks[: self.num_stages]
        assert max(self.out_indices) < self.num_stages
        norm = self.norm_cfg or {"type": "FrozenBN"}

        x = ConvModule(
            24, 3, stride=2, padding=1, norm_cfg=norm, act="relu",
            dtype=self.dtype, name="stem",
        )(x, train=train)
        x = max_pool_same_torch(x, window=3, stride=2, padding=1)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for i, (planes, blocks) in enumerate(zip(stage_planes, stage_blocks)):
            for j in range(blocks):
                x = ShuffleBottleneck(
                    planes,
                    groups=self.groups,
                    first_group=not (i == 0 and j == 0),
                    stride=self.strides[i] if j == 0 else 1,
                    dilation=self.dilations[i],
                    norm_cfg=norm,
                    dtype=self.dtype,
                    name=f"stage{i + 2}_{j}",
                )(x, train=train)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)


class ShuffleV2Block(nn.Module):
    """v2 block. stride 1: split channels, transform right branch, concat,
    shuffle. stride 2: both branches consume the full input (left = dw+pw,
    right = pw+dw+pw), concat doubles the width, shuffle."""

    outplanes: int
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = self.norm_cfg or {"type": "FrozenBN"}
        half = self.outplanes // 2

        def right_branch(inp, name):
            out = ConvModule(half, 1, norm_cfg=norm, act="relu", dtype=self.dtype, name=f"{name}_pw1")(inp, train=train)
            out = ConvModule(
                half, 3, stride=self.stride, padding=self.dilation,
                dilation=self.dilation, groups=half, norm_cfg=norm, act=None,
                dtype=self.dtype, name=f"{name}_dw",
            )(out, train=train)
            return ConvModule(half, 1, norm_cfg=norm, act="relu", dtype=self.dtype, name=f"{name}_pw2")(out, train=train)

        if self.stride == 1:
            left, right = channel_split(x, 2)
            right = right_branch(right, "right")
            out = jnp.concatenate([left, right], axis=-1)
        else:
            in_ch = x.shape[-1]
            left = ConvModule(
                in_ch, 3, stride=2, padding=self.dilation, dilation=self.dilation,
                groups=in_ch, norm_cfg=norm, act=None, dtype=self.dtype, name="left_dw",
            )(x, train=train)
            left = ConvModule(half, 1, norm_cfg=norm, act="relu", dtype=self.dtype, name="left_pw")(left, train=train)
            right = right_branch(x, "right")
            out = jnp.concatenate([left, right], axis=-1)
        return channel_shuffle(out, 2)


@BACKBONES.register_module
class ShuffleNetV2(nn.Module):
    width_mult: float = 1.0
    num_stages: int = 3
    strides: Tuple[int, ...] = (2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1)
    out_indices: Tuple[int, ...] = (0, 1, 2)
    frozen_stages: int = -1
    with_last_conv: bool = True  # conv5 1x1 -> 1024/2048 on the final stage
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        if self.width_mult not in SHUFFLENETV2_SETTINGS:
            raise KeyError(f"unsupported width_mult {self.width_mult}")
        channels, stage_blocks = SHUFFLENETV2_SETTINGS[self.width_mult]
        stage_planes = channels[: self.num_stages]
        stage_blocks = stage_blocks[: self.num_stages]
        assert max(self.out_indices) < self.num_stages
        norm = self.norm_cfg or {"type": "FrozenBN"}

        x = ConvModule(
            24, 3, stride=2, padding=1, norm_cfg=norm, act="relu",
            dtype=self.dtype, name="stem",
        )(x, train=train)
        x = max_pool_same_torch(x, window=3, stride=2, padding=1)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for i, (planes, blocks) in enumerate(zip(stage_planes, stage_blocks)):
            for j in range(blocks):
                x = ShuffleV2Block(
                    planes,
                    stride=self.strides[i] if j == 0 else 1,
                    dilation=self.dilations[i],
                    norm_cfg=norm,
                    dtype=self.dtype,
                    name=f"stage{i + 2}_{j}",
                )(x, train=train)
            if i == self.num_stages - 1 and self.with_last_conv:
                x = ConvModule(
                    channels[-1], 1, norm_cfg=norm, act="relu",
                    dtype=self.dtype, name="conv5",
                )(x, train=train)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
