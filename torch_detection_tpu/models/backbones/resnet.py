"""ResNet-family backbones (flax.linen, NHWC): ResNet / ResNeXt / SE-ResNet /
SE-ResNeXt in one parametric implementation.

Parity surface (TCGGroup/Torch_Detection):
  * ``models/backbone/resnet.py:178-184`` arch table (depths 18/34/50/101/152),
  * ``resnet.py:9-119`` BasicBlock/Bottleneck ('pytorch' style: stride on the
    3x3 conv), per-stage stride/dilation, multi-scale ``out_indices``,
  * ``resnext.py:81-87`` grouped bottleneck width
    ``D = floor(planes * base_width / 64) * groups``,
  * ``se_resnet.py:36,96,120`` / ``se_resnext.py:104,183`` SE after last norm,
  * ``resnet.py:270-294`` frozen stages + BN-eval semantics.

TPU-first design decisions (not a torch translation):
  * one parametric module instead of four near-duplicate class trees;
  * FrozenBN folded to a fused multiply-add (no batch-stat collectives under
    data parallelism) — ``bn_eval=True`` is the only mode the reference ever
    runs for detection, so it is the default here;
  * ``frozen_stages`` implemented as ``jax.lax.stop_gradient`` on the frozen
    prefix's output: gradients to every param at or below the cut are exactly
    zero, and XLA prunes the dead backward graph at compile time (the
    reference's requires_grad flags have no JAX analog);
  * NHWC + HWIO so convs hit the MXU in its native layout.

Param naming mirrors torchvision (conv1/bn1/layer{i}_{j}/...) so the torch
checkpoint importer (models/torch_import.py) is a mechanical key map.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES
from ..layers import ConvModule, SELayer, build_norm, max_pool_same_torch

Dtype = Any


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (ResNet-18/34). expansion = 1."""

    planes: int
    stride: int = 1
    dilation: int = 1
    with_downsample: bool = False
    with_se: bool = False
    se_reduction: int = 16
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = self.norm_cfg or {"type": "FrozenBN"}
        identity = x
        out = ConvModule(
            self.planes, 3, stride=self.stride, padding=self.dilation,
            dilation=self.dilation, norm_cfg=norm, act="relu",
            dtype=self.dtype, name="block1",
        )(x, train=train)
        out = ConvModule(
            self.planes, 3, padding=1, norm_cfg=norm, act=None,
            dtype=self.dtype, name="block2",
        )(out, train=train)
        if self.with_se:
            out = SELayer(self.planes, self.se_reduction, dtype=self.dtype, name="se")(out)
        if self.with_downsample:
            identity = ConvModule(
                self.planes, 1, stride=self.stride, norm_cfg=norm, act=None,
                dtype=self.dtype, name="downsample",
            )(x, train=train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, dilation, groups) -> 1x1 residual block. expansion=4.

    ``groups``/``base_width`` generalize to ResNeXt
    (width = floor(planes * base_width / 64) * groups).
    """

    planes: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    with_downsample: bool = False
    with_se: bool = False
    se_reduction: int = 16
    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm = self.norm_cfg or {"type": "FrozenBN"}
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_channels = self.planes * self.expansion
        identity = x
        out = ConvModule(
            width, 1, norm_cfg=norm, act="relu", dtype=self.dtype, name="block1",
        )(x, train=train)
        out = ConvModule(
            width, 3, stride=self.stride, padding=self.dilation,
            dilation=self.dilation, groups=self.groups, norm_cfg=norm,
            act="relu", dtype=self.dtype, name="block2",
        )(out, train=train)
        out = ConvModule(
            out_channels, 1, norm_cfg=norm, act=None, dtype=self.dtype, name="block3",
        )(out, train=train)
        if self.with_se:
            out = SELayer(out_channels, self.se_reduction, dtype=self.dtype, name="se")(out)
        if self.with_downsample:
            identity = ConvModule(
                out_channels, 1, stride=self.stride, norm_cfg=norm, act=None,
                dtype=self.dtype, name="downsample",
            )(x, train=train)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


def space_to_depth_2x2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (p, q, c).

    The host-side wire transform behind ``stem_s2d`` (numpy twin in
    data/collate.py): done on u8 before the device transfer it is free;
    done on-device it is a minor-dim transpose XLA runs at ~12 GB/s
    (measured r3: 4.3 ms at b8 800x1216 bf16) — only use this jnp version
    off-TPU or in tests.
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


class _FoldedStemConv(nn.Module):
    """The 7x7 stride-2 stem conv evaluated on the 2x2 space-to-depth wire.

    XLA runs the canonical 7x7s2 conv on 3 channels at 3.8% MFU (4.86 ms at
    b8 800x1216 bf16 — measured r3, the single most expensive op in the R50
    forward); the SAME contraction expressed as a 4x4 stride-1 conv over
    (H/2, W/2, 12) runs in 1.27 ms.  The logical parameter stays the
    torchvision (7, 7, cin, 64) kernel — checkpoints and the torch importer
    are unaffected — and is re-indexed into the folded (4, 4, 4cin, 64)
    kernel at trace time:  with torch pad=3, original tap (dy, dx) feeds
    folded tap (a, b) and s2d channel (p, q, c) where dy = 2a + p - 1,
    dx = 2b + q - 1 (the (a=0, p=0) row/column falls outside the 7-tap
    support and is zero).  Folded padding ((2, 1), (2, 1)) reproduces the
    original window exactly; the only numeric delta vs the unfolded conv is
    accumulation order.
    """

    features: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1] // 4
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, cin, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w44 = (
            k8.reshape(4, 2, 4, 2, cin, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * cin, self.features)
        )
        return jax.lax.conv_general_dilated(
            x.astype(dtype),
            w44.astype(dtype),
            (1, 1),
            ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class S2DStem(nn.Module):
    """Drop-in stem (conv -> norm -> relu) on the s2d wire; param tree is
    identical to the ConvModule stem (stem/conv/kernel, stem/norm/...)."""

    norm_cfg: Optional[dict] = None
    dtype: Optional[Dtype] = None

    def setup(self):
        self.conv = _FoldedStemConv(dtype=self.dtype, name="conv")
        self.norm = build_norm(self.norm_cfg, dtype=self.dtype, name="norm")

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self.conv(x)
        if self.norm is not None:
            if isinstance(self.norm, nn.BatchNorm):
                x = self.norm(x, use_running_average=not train)
            else:
                x = self.norm(x)
        return nn.relu(x)


@BACKBONES.register_module
class ResNet(nn.Module):
    """Multi-scale feature extractor: returns features at ``out_indices``
    (C2..C5, strides 4/8/16/32).

    ``stem_s2d=True`` switches the stem to the space-to-depth formulation
    (see ``_FoldedStemConv``): the input may be either the s2d wire
    (B, H/2, W/2, 4*cin) — the fast path, produced by the host/loader — or
    a plain image (B, H, W, cin), converted in-model (slow on TPU)."""

    depth: int = 50
    num_stages: int = 4
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    groups: int = 1
    base_width: int = 64
    with_se: bool = False
    se_reduction: int = 16
    norm_cfg: Optional[dict] = None
    remat: bool = False  # jax.checkpoint each block: trade FLOPs for HBM
    stem_s2d: bool = False  # folded stem on the 2x2 space-to-depth wire
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, ...]:
        if self.depth not in ARCH_SETTINGS:
            raise KeyError(f"unsupported ResNet depth {self.depth}")
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[: self.num_stages]
        assert 1 <= self.num_stages <= 4
        assert len(self.strides) >= self.num_stages and len(self.dilations) >= self.num_stages
        assert max(self.out_indices) < self.num_stages
        norm = self.norm_cfg or {"type": "FrozenBN"}

        # stem: 7x7 s2 -> norm -> relu -> maxpool 3x3 s2 (overall stride 4)
        if self.stem_s2d:
            if x.shape[-1] not in (12,):  # plain image: fold in-model (slow on TPU)
                x = space_to_depth_2x2(x)
            x = S2DStem(norm_cfg=norm, dtype=self.dtype, name="stem")(x, train=train)
        else:
            x = ConvModule(64, 7, stride=2, padding=3, norm_cfg=norm, act="relu",
                           dtype=self.dtype, name="stem")(x, train=train)
        x = max_pool_same_torch(x, window=3, stride=2, padding=1)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        inplanes = 64
        # remat re-computes each block's activations in the backward pass —
        # ~30% more FLOPs for ~O(depth) less live HBM during training
        wrapped_cls = nn.remat(block_cls, static_argnums=(2,)) if self.remat else block_cls
        for i, num_blocks in enumerate(stage_blocks):
            planes = 64 * 2**i
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(num_blocks):
                block_stride = stride if j == 0 else 1
                needs_down = j == 0 and (block_stride != 1 or inplanes != planes * block_cls.expansion)
                kwargs = dict(
                    planes=planes,
                    stride=block_stride,
                    dilation=dilation,
                    with_downsample=needs_down,
                    with_se=self.with_se,
                    se_reduction=self.se_reduction,
                    norm_cfg=norm,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )
                if block_cls is Bottleneck:
                    kwargs.update(groups=self.groups, base_width=self.base_width)
                x = wrapped_cls(**kwargs)(x, train)
            inplanes = planes * block_cls.expansion
            if self.frozen_stages >= i + 1:
                x = jax.lax.stop_gradient(x)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)

    @property
    def feature_channels(self) -> Tuple[int, ...]:
        block_cls, _ = ARCH_SETTINGS[self.depth]
        return tuple(64 * 2**i * block_cls.expansion for i in self.out_indices)


@BACKBONES.register_module
class ResNeXt(ResNet):
    """ResNeXt: grouped bottleneck (default 32x4d)."""

    groups: int = 32
    base_width: int = 4


@BACKBONES.register_module
class SEResNet(ResNet):
    """SE-ResNet: squeeze-excitation after each block's last norm."""

    with_se: bool = True


@BACKBONES.register_module
class SEResNeXt(ResNeXt):
    """SE-ResNeXt: grouped bottleneck + squeeze-excitation."""

    with_se: bool = True
