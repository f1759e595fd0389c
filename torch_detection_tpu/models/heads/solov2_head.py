"""SOLOv2 heads: per-grid dynamic mask kernels + unified mask features.

Wang et al., "SOLOv2: Dynamic and Fast Instance Segmentation" (NeurIPS
2020).  Dense instance segmentation WITHOUT boxes, RoIAlign, or anchor
machinery — the reference (TCGGroup/Torch_Detection) has no detector tier
at all (SURVEY.md §2 #33); this family adds the "segment objects by
location" paradigm beside Mask R-CNN's detect-then-segment.

TPU design: everything here is convolution and bilinear-resize work — the
dynamic mask assembly (each positive grid cell's predicted E-vector acts as
a 1x1 conv over the unified mask features) is a single (cells, E) @
(E, H*W) matmul in the detector, and Matrix NMS replaces greedy
suppression with two more matmuls (``ops/nms.py:matrix_nms``).  Grid sizes
and the mask-feature canvas are compile-time constants; no dynamic shapes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import HEADS
from ..inits import bias_init_with_prob

Dtype = Any


def _coord_channels(h: int, w: int, dtype) -> jnp.ndarray:
    """(h, w, 2) normalized coordinates in [-1, 1] (the coordconv trick)."""
    ys = jnp.linspace(-1.0, 1.0, h, dtype=jnp.float32)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=jnp.float32)
    yy = jnp.broadcast_to(ys[:, None], (h, w))
    xx = jnp.broadcast_to(xs[None, :], (h, w))
    return jnp.stack([xx, yy], axis=-1).astype(dtype)


def _resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Batch bilinear resize (B, H, W, C) -> (B, *size, C)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


@HEADS.register_module
class SOLOV2Head(nn.Module):
    """Per-level category scores (S, S, C) + dynamic kernels (S, S, E).

    Each FPN level's feature is resized to its (S_l, S_l) grid; the kernel
    branch sees two extra normalized-coordinate channels (the kernel must
    know WHERE its cell is — the dynamic conv it parameterizes is applied
    to a position-sensitive mask feature map).
    """

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    kernel_channels: int = 128  # E: dynamic 1x1 conv width == mask feat width
    stacked_convs: int = 4
    grid_numbers: Tuple[int, ...] = (40, 36, 24, 16, 12)
    norm_groups: int = 32  # GN groups (tiny test configs use fewer)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, feats: Sequence[jax.Array], train: bool = False
    ) -> Tuple[Tuple[jax.Array, ...], Tuple[jax.Array, ...]]:
        from ..layers import ConvModule

        norm_cfg = dict(type="GN", num_groups=self.norm_groups)
        cls_tower = [
            ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm_cfg,
                       act="relu", dtype=self.dtype, name=f"cls_tower{i}")
            for i in range(self.stacked_convs)
        ]
        kernel_tower = [
            ConvModule(self.feat_channels, 3, padding=1, norm_cfg=norm_cfg,
                       act="relu", dtype=self.dtype, name=f"kernel_tower{i}")
            for i in range(self.stacked_convs)
        ]
        cls_out = nn.Conv(
            self.num_classes, (3, 3), padding=1, dtype=self.dtype,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.full(
                shape, bias_init_with_prob(0.01), dtype
            ),
            name="cls_out",
        )
        kernel_out = nn.Conv(
            self.kernel_channels, (3, 3), padding=1, dtype=self.dtype,
            name="kernel_out",
        )

        assert len(feats) == len(self.grid_numbers), (
            f"{len(feats)} levels vs {len(self.grid_numbers)} grids"
        )
        cls_scores, kernels = [], []
        for f, s in zip(feats, self.grid_numbers):
            b, h, w, _ = f.shape
            coords = jnp.broadcast_to(
                _coord_channels(h, w, f.dtype)[None], (b, h, w, 2)
            )
            kf = _resize_bilinear(jnp.concatenate([f, coords], axis=-1), (s, s))
            cf = _resize_bilinear(f, (s, s))
            for m in kernel_tower:
                kf = m(kf, train=train)
            for m in cls_tower:
                cf = m(cf, train=train)
            cls_scores.append(cls_out(cf))  # (B, S, S, C)
            kernels.append(kernel_out(kf))  # (B, S, S, E)
        return tuple(cls_scores), tuple(kernels)


@HEADS.register_module
class MaskFeatHead(nn.Module):
    """Unified mask features at stride-4 resolution: (B, H/4, W/4, E).

    Consumes the first ``num_inputs`` FPN levels (P2..P5).  Each level is
    convolved and bilinearly upsampled to the P2 canvas; the DEEPEST level
    gets coordconv channels (position information for the dynamic conv to
    exploit).  The sum goes through a final 1x1 projection to E channels.
    """

    in_channels: int = 256
    feat_channels: int = 128
    out_channels: int = 128  # E
    num_inputs: int = 4
    norm_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False) -> jax.Array:
        from ..layers import ConvModule

        norm_cfg = dict(type="GN", num_groups=self.norm_groups)
        feats = feats[: self.num_inputs]
        b, h0, w0, _ = feats[0].shape
        acc = None
        for lvl, f in enumerate(feats):
            x = f
            if lvl == self.num_inputs - 1:
                bh, hh, wh, _ = x.shape
                coords = jnp.broadcast_to(
                    _coord_channels(hh, wh, x.dtype)[None], (bh, hh, wh, 2)
                )
                x = jnp.concatenate([x, coords], axis=-1)
            x = ConvModule(
                self.feat_channels, 3, padding=1, norm_cfg=norm_cfg, act="relu",
                dtype=self.dtype, name=f"lateral{lvl}",
            )(x, train=train)
            if x.shape[1:3] != (h0, w0):
                x = _resize_bilinear(x, (h0, w0))
            acc = x if acc is None else acc + x
        return ConvModule(
            self.out_channels, 1, padding=0, norm_cfg=norm_cfg, act="relu",
            dtype=self.dtype, name="out_conv",
        )(acc, train=train)
