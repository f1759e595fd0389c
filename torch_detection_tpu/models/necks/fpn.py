"""FPN / PAFPN necks (flax.linen, NHWC).

Parity surface (TCGGroup/Torch_Detection):
  * ``models/necks/fpn.py:9-125``: lateral 1x1 per level, top-down nearest-2x
    upsample + add, 3x3 smoothing, extra levels via stride-2 maxpool
    (Faster R-CNN style) or stride-2 convs from C5 with relu between P6->P7
    (RetinaNet style);
  * ``models/necks/pafpn.py:9-148``: FPN + bottom-up path aggregation
    ``N_i = pa_conv2(N_{i-1} downsampled) + P_i`` then 3x3 smoothing.

The top-down 2x upsample is a broadcast-reshape (layers.resize_nearest_2x) —
bit-exact with torch nearest interpolation and fusion-friendly for XLA.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from ...utils.registry import NECKS
from ..layers import ConvModule, max_pool_same_torch, resize_nearest

Dtype = Any


@NECKS.register_module
class FPN(nn.Module):
    """Feature Pyramid Network.

    Args mirror the reference surface: ``in_channels`` per input level,
    single ``out_channels``, ``num_outs`` >= len(inputs), and the extra-level
    source switch (``add_extra_convs``: False -> stride-2 maxpool chain,
    True -> stride-2 convs; ``extra_convs_on_inputs`` picks C5 vs P5 input).
    """

    in_channels: Tuple[int, ...]
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: bool = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    norm_cfg: Optional[dict] = None
    act: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, inputs: Tuple[jax.Array, ...], train: bool = False) -> Tuple[jax.Array, ...]:
        assert len(inputs) == len(self.in_channels)
        end_level = len(inputs) if self.end_level == -1 else self.end_level
        used = list(range(self.start_level, end_level))
        assert self.num_outs >= len(used)

        # lateral 1x1
        laterals = [
            ConvModule(
                self.out_channels, 1, norm_cfg=self.norm_cfg, act=self.act,
                dtype=self.dtype, name=f"lateral{i}",
            )(inputs[i], train=train)
            for i in used
        ]

        # top-down pathway
        for i in range(len(laterals) - 1, 0, -1):
            target_hw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_nearest(laterals[i], target_hw)

        # 3x3 smoothing
        outs = [
            ConvModule(
                self.out_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act=self.act, dtype=self.dtype, name=f"fpn{i}",
            )(laterals[i], train=train)
            for i in range(len(laterals))
        ]

        # extra levels
        extra = self.num_outs - len(outs)
        if extra > 0:
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(max_pool_same_torch(outs[-1], window=1, stride=2, padding=0))
            else:
                source = inputs[used[-1]] if self.extra_convs_on_inputs else outs[-1]
                for k in range(extra):
                    if k > 0:
                        source = nn.relu(outs[-1]) if self.relu_before_extra_convs else outs[-1]
                    outs.append(
                        ConvModule(
                            self.out_channels, 3, stride=2, padding=1,
                            norm_cfg=self.norm_cfg, act=self.act,
                            dtype=self.dtype, name=f"extra{k}",
                        )(source, train=train)
                    )
        return tuple(outs)


@NECKS.register_module
class PAFPN(FPN):
    """Path-Aggregation FPN: FPN + bottom-up pathway.

    After the FPN top-down pass, aggregate upward:
    ``N_{i+1} = fpn_out_{i+1} + downsample_conv(N_i)`` followed by a 3x3
    smoothing conv, matching reference ``pafpn.py:129-147``.
    """

    @nn.compact
    def __call__(self, inputs: Tuple[jax.Array, ...], train: bool = False) -> Tuple[jax.Array, ...]:
        assert len(inputs) == len(self.in_channels)
        end_level = len(inputs) if self.end_level == -1 else self.end_level
        used = list(range(self.start_level, end_level))
        assert self.num_outs >= len(used)

        laterals = [
            ConvModule(
                self.out_channels, 1, norm_cfg=self.norm_cfg, act=self.act,
                dtype=self.dtype, name=f"lateral{i}",
            )(inputs[i], train=train)
            for i in used
        ]
        for i in range(len(laterals) - 1, 0, -1):
            target_hw = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + resize_nearest(laterals[i], target_hw)
        fpn_outs = [
            ConvModule(
                self.out_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act=self.act, dtype=self.dtype, name=f"fpn{i}",
            )(laterals[i], train=train)
            for i in range(len(laterals))
        ]

        # bottom-up path aggregation
        outs = [fpn_outs[0]]
        for i in range(1, len(fpn_outs)):
            down = ConvModule(
                self.out_channels, 3, stride=2, padding=1,
                norm_cfg=self.norm_cfg, act=self.act,
                dtype=self.dtype, name=f"pa_down{i}",
            )(outs[-1], train=train)
            fused = ConvModule(
                self.out_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                act=self.act, dtype=self.dtype, name=f"pa_out{i}",
            )(fpn_outs[i] + down, train=train)
            outs.append(fused)

        extra = self.num_outs - len(outs)
        if extra > 0:
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(max_pool_same_torch(outs[-1], window=1, stride=2, padding=0))
            else:
                source = inputs[used[-1]] if self.extra_convs_on_inputs else outs[-1]
                for k in range(extra):
                    if k > 0:
                        source = nn.relu(outs[-1]) if self.relu_before_extra_convs else outs[-1]
                    outs.append(
                        ConvModule(
                            self.out_channels, 3, stride=2, padding=1,
                            norm_cfg=self.norm_cfg, act=self.act,
                            dtype=self.dtype, name=f"extra{k}",
                        )(source, train=train)
                    )
        return tuple(outs)
