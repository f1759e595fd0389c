"""CSPDarknet backbone (YOLOX / YOLOv5 family).

Ge et al., "YOLOX: Exceeding YOLO Series in 2021".  Cross-Stage-Partial
Darknet: a Focus (2x2 space-to-depth) stem, four stages of strided conv +
CSP layer (split -> bottleneck stack -> concat -> fuse), SPP on the last
stage, SiLU activations throughout.  Reference context: the reference zoo
(TCGGroup/Torch_Detection ``models/backbone/``) stops at classic
classification trunks; this is the detector-native trunk its YOLO lineage
leads to.

TPU notes: the Focus stem IS the space-to-depth trick this repo already
measured as the right TPU stem shape (CLAUDE.md stem_s2d — a 4x-channel
stride-1 conv instead of a wide strided conv); SPP's parallel maxpools are
cheap fused VPU work; every CSP split/concat is channel-dim only (lane
dimension), no spatial relayout.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..layers import ConvModule

Dtype = Any


class DarknetBottleneck(nn.Module):
    """1x1 reduce -> 3x3, optional residual add."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.out_channels * self.expansion)
        y = ConvModule(hidden, 1, norm_cfg=self.norm_cfg, act="silu",
                       dtype=self.dtype, name="conv1")(x, train=train)
        y = ConvModule(self.out_channels, 3, padding=1, norm_cfg=self.norm_cfg,
                       act="silu", dtype=self.dtype, name="conv2")(y, train=train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """Cross-stage-partial layer: two 1x1 branches, one through ``num_blocks``
    bottlenecks, concatenated and fused by a final 1x1."""

    out_channels: int
    num_blocks: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = int(self.out_channels * self.expansion)
        main = ConvModule(hidden, 1, norm_cfg=self.norm_cfg, act="silu",
                          dtype=self.dtype, name="main")(x, train=train)
        short = ConvModule(hidden, 1, norm_cfg=self.norm_cfg, act="silu",
                           dtype=self.dtype, name="short")(x, train=train)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(
                hidden, shortcut=self.shortcut, expansion=1.0,
                norm_cfg=self.norm_cfg, dtype=self.dtype, name=f"block{i}",
            )(main, train=train)
        y = jnp.concatenate([main, short], axis=-1)
        return ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                          act="silu", dtype=self.dtype, name="final")(y, train=train)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling: parallel same-pad maxpools (5/9/13), concat."""

    out_channels: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = x.shape[-1] // 2
        y = ConvModule(hidden, 1, norm_cfg=self.norm_cfg, act="silu",
                       dtype=self.dtype, name="conv1")(x, train=train)
        pools = [y]
        for k in self.kernel_sizes:
            pools.append(nn.max_pool(y, (k, k), strides=(1, 1), padding="SAME"))
        y = jnp.concatenate(pools, axis=-1)
        return ConvModule(self.out_channels, 1, norm_cfg=self.norm_cfg,
                          act="silu", dtype=self.dtype, name="conv2")(y, train=train)


@BACKBONES.register_module
class CSPDarknet(nn.Module):
    """Focus stem + 4 CSP stages; ``out_indices`` over stages 1..4.

    ``deepen_factor``/``widen_factor`` follow the YOLOX scaling convention
    (yolox-s = 0.33/0.5); base widths (64, 128, 256, 512, 1024) and block
    counts (3, 9, 9, 3) before scaling.  ``out_indices=(2, 3, 4)`` yields
    C3/C4/C5 at strides 8/16/32.
    """

    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    out_indices: Tuple[int, ...] = (2, 3, 4)
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        norm_cfg = dict(self.norm_cfg) if self.norm_cfg else {"type": "FrozenBN"}
        widths = [max(int(round(w * self.widen_factor)), 8)
                  for w in (64, 128, 256, 512, 1024)]
        depths = [max(int(round(d * self.deepen_factor)), 1) for d in (3, 9, 9, 3)]

        # Focus stem: 2x2 space-to-depth (12-channel stride-1 wire) + 3x3 —
        # the TPU-friendly stem shape (see module docstring)
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = ConvModule(widths[0], 3, padding=1, norm_cfg=norm_cfg, act="silu",
                       dtype=self.dtype, name="stem")(x, train=train)

        outs = []
        for i in range(4):
            x = ConvModule(widths[i + 1], 3, stride=2, padding=1,
                           norm_cfg=norm_cfg, act="silu", dtype=self.dtype,
                           name=f"down{i}")(x, train=train)
            if i == 3:
                x = SPPBottleneck(widths[4], norm_cfg=norm_cfg, dtype=self.dtype,
                                  name="spp")(x, train=train)
            x = CSPLayer(
                widths[i + 1], num_blocks=depths[i], shortcut=(i != 3),
                norm_cfg=norm_cfg, dtype=self.dtype, name=f"stage{i + 1}",
            )(x, train=train)
            if (i + 1) in self.out_indices:
                outs.append(x)
        return tuple(outs)
