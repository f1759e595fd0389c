"""VGG backbone (flax.linen, NHWC).

Parity surface: reference ``models/backbone/vgg.py`` (TCGGroup/
Torch_Detection): depths 11/13/16/19 as ConvModule stacks + 2x2 maxpool per
stage (``vgg.py:73-78``, ``_make_vgg_layer:8-47``), per-stage stride/dilation,
multi-scale ``out_indices``, optional norm.

Fixed (SURVEY.md appendix): the reference's ``planes = max(64 * 2**i, 512)``
makes every stage 512-wide (``vgg.py:116``); the correct VGG widths are
``min(64 * 2**i, 512)`` = 64/128/256/512/512.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..layers import ConvModule, max_pool_same_torch

Dtype = Any

ARCH_SETTINGS = {
    11: (1, 1, 2, 2, 2),
    13: (2, 2, 2, 2, 2),
    16: (2, 2, 3, 3, 3),
    19: (2, 2, 4, 4, 4),
}


@BACKBONES.register_module
class VGG(nn.Module):
    depth: int = 16
    num_stages: int = 5
    strides: Tuple[int, ...] = (1, 1, 1, 1, 1)
    dilations: Tuple[int, ...] = (1, 1, 1, 1, 1)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3, 4)
    frozen_stages: int = -1
    norm_cfg: Optional[dict] = None  # None = plain conv+relu (classic VGG)
    with_final_maxpool: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        if self.depth not in ARCH_SETTINGS:
            raise KeyError(f"unsupported VGG depth {self.depth}")
        stage_blocks = ARCH_SETTINGS[self.depth][: self.num_stages]
        assert 1 <= self.num_stages <= 5
        assert len(self.strides) >= self.num_stages
        assert max(self.out_indices) < self.num_stages

        outs = []
        for i, num_blocks in enumerate(stage_blocks):
            planes = min(64 * 2**i, 512)
            for j in range(num_blocks):
                x = ConvModule(
                    planes, 3,
                    stride=self.strides[i] if j == 0 else 1,
                    padding=self.dilations[i],
                    dilation=self.dilations[i],
                    norm_cfg=self.norm_cfg,
                    use_bias=True,
                    act="relu",
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
            if self.with_final_maxpool or i < len(stage_blocks) - 1:
                x = max_pool_same_torch(x, window=2, stride=2, padding=0)
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)
