"""Multi-level anchor generation (pure jnp, fixed shapes).

This fills the reference's empty ``core/`` tier (``core/__init__.py`` is 0
lines in TCGGroup/Torch_Detection; SURVEY.md §2 #32 marks anchors as
[ABSENT -> must build]).  Semantics follow the mmdetection AnchorGenerator
family the reference derives from, with the delta-coding hooks the reference
already exposes (``datasets/utils/bbox.py:118-166``).

TPU notes: anchors for a static feature-map size are compile-time constants —
under ``jit`` XLA folds the whole generation into the executable, so "anchor
generation cost" is zero at steady state.  Everything here is
broadcasted-iota + elementwise; no host loops at trace time beyond the
per-level python loop (static level count).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def base_anchors(
    base_size: float,
    ratios: Sequence[float],
    scales: Sequence[float],
    center_offset: float = 0.0,
) -> jnp.ndarray:
    """Base anchors for one level, centered on cell (0, 0).

    Returns (A, 4) xyxy with A = len(ratios) * len(scales); rows ordered
    scale-major within each ratio (mmdet convention: for each ratio, all
    scales).
    """
    w = h = float(base_size)
    cx = center_offset * w
    cy = center_offset * h
    ratios = jnp.asarray(ratios, jnp.float32)
    scales = jnp.asarray(scales, jnp.float32)
    h_ratios = jnp.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    ws = (w * w_ratios[:, None] * scales[None, :]).reshape(-1)
    hs = (h * h_ratios[:, None] * scales[None, :]).reshape(-1)
    return jnp.stack(
        [cx - 0.5 * ws, cy - 0.5 * hs, cx + 0.5 * ws, cy + 0.5 * hs], axis=-1
    )


def grid_anchors(
    base: jnp.ndarray, featmap_size: Tuple[int, int], stride: int
) -> jnp.ndarray:
    """Tile (A, 4) base anchors over an H x W grid with the given stride.

    Returns (H*W*A, 4); row-major over (y, x) then anchor index — the same
    flattening order as a (H, W, A, ...) head output reshaped to (-1, ...).
    """
    h, w = featmap_size
    shift_x = jnp.arange(w, dtype=jnp.float32) * stride
    shift_y = jnp.arange(h, dtype=jnp.float32) * stride
    sx = jnp.broadcast_to(shift_x[None, :], (h, w)).reshape(-1)
    sy = jnp.broadcast_to(shift_y[:, None], (h, w)).reshape(-1)
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # (H*W, 4)
    all_anchors = base[None, :, :] + shifts[:, None, :]
    return all_anchors.reshape(-1, 4)


def valid_flags(
    featmap_size: Tuple[int, int],
    valid_size: Tuple[int, int],
    num_base_anchors: int,
) -> jnp.ndarray:
    """(H*W*A,) bool — True where the anchor cell lies inside the un-padded
    image region (pad-to-divisor means the right/bottom cells see padding)."""
    h, w = featmap_size
    vh, vw = valid_size
    vy = jnp.arange(h) < vh
    vx = jnp.arange(w) < vw
    v = (vy[:, None] & vx[None, :]).reshape(-1)
    return jnp.repeat(v, num_base_anchors)


@dataclasses.dataclass(frozen=True)
class AnchorGenerator:
    """Multi-level anchor generator.

    Two parameterizations:
      * explicit ``scales`` (Faster R-CNN style), or
      * ``octave_base_scale`` + ``scales_per_octave`` (RetinaNet style:
        scales = obs * 2**(i / spo)).
    ``strides`` double as base sizes unless ``base_sizes`` is given.
    """

    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    scales: Optional[Tuple[float, ...]] = None
    octave_base_scale: Optional[float] = 4.0
    scales_per_octave: int = 3
    base_sizes: Optional[Tuple[int, ...]] = None
    center_offset: float = 0.0

    def __post_init__(self):
        if self.scales is None and self.octave_base_scale is None:
            raise ValueError("need scales or octave_base_scale")

    @property
    def resolved_scales(self) -> Tuple[float, ...]:
        if self.scales is not None:
            return tuple(self.scales)
        return tuple(
            self.octave_base_scale * 2 ** (i / self.scales_per_octave)
            for i in range(self.scales_per_octave)
        )

    @property
    def num_base_anchors(self) -> int:
        return len(self.ratios) * len(self.resolved_scales)

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    def base_anchors_for_level(self, level: int) -> jnp.ndarray:
        sizes = self.base_sizes if self.base_sizes is not None else self.strides
        return base_anchors(sizes[level], self.ratios, self.resolved_scales, self.center_offset)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
        """Per-level (Hi*Wi*A, 4) anchors for the given feature-map sizes."""
        assert len(featmap_sizes) == self.num_levels
        return [
            grid_anchors(self.base_anchors_for_level(i), featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)
        ]

    def flat_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
        """All levels concatenated: (sum_i Hi*Wi*A, 4)."""
        return jnp.concatenate(self.grid_anchors(featmap_sizes), axis=0)

    def valid_flags(
        self,
        featmap_sizes: Sequence[Tuple[int, int]],
        img_shape: Tuple[int, int],
    ) -> jnp.ndarray:
        """Flat (sum_i Hi*Wi*A,) validity for an image of (h, w) inside the
        padded canvas."""
        h, w = img_shape
        flags = []
        for i, fs in enumerate(featmap_sizes):
            s = self.strides[i]
            valid = (min(int(math.ceil(h / s)), fs[0]), min(int(math.ceil(w / s)), fs[1]))
            flags.append(valid_flags(fs, valid, self.num_base_anchors))
        return jnp.concatenate(flags, axis=0)

    def featmap_sizes_for(self, pad_shape: Tuple[int, int]) -> List[Tuple[int, int]]:
        """Feature-map sizes produced by a divisor-padded (h, w) canvas."""
        h, w = pad_shape
        return [(int(math.ceil(h / s)), int(math.ceil(w / s))) for s in self.strides]


@dataclasses.dataclass(frozen=True)
class YOLOAnchorGenerator:
    """YOLOv3 anchors: explicit per-level (w, h) base sizes, cell-centered.

    Canonical COCO geometry (608-input k-means priors), levels ordered
    coarse->fine to match the YOLOV3Neck/Head output order.  Each cell emits
    one anchor per (w, h) pair centered on ``(i + 0.5) * stride``.
    """

    strides: Tuple[int, ...] = (32, 16, 8)
    base_sizes: Tuple[Tuple[Tuple[float, float], ...], ...] = (
        ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0)),
        ((30.0, 61.0), (62.0, 45.0), (59.0, 119.0)),
        ((10.0, 13.0), (16.0, 30.0), (33.0, 23.0)),
    )

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> int:
        return len(self.base_sizes[0])

    def base_anchors_for_level(self, level: int) -> jnp.ndarray:
        c = 0.5 * float(self.strides[level])
        rows = [
            (c - 0.5 * w, c - 0.5 * h, c + 0.5 * w, c + 0.5 * h)
            for w, h in self.base_sizes[level]
        ]
        return jnp.asarray(rows, jnp.float32)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
        assert len(featmap_sizes) == self.num_levels
        return [
            grid_anchors(self.base_anchors_for_level(i), featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)
        ]

    def flat_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
        return jnp.concatenate(self.grid_anchors(featmap_sizes), axis=0)

    def flat_strides(self, featmap_sizes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
        """(N,) f32 stride of each flat anchor (encode/decode scale)."""
        per_level = [
            jnp.full((h * w * self.num_base_anchors,), float(s), jnp.float32)
            for (h, w), s in zip(featmap_sizes, self.strides)
        ]
        return jnp.concatenate(per_level, axis=0)

    def responsible_flags(
        self,
        featmap_sizes: Sequence[Tuple[int, int]],
        gt_boxes: jnp.ndarray,  # (G, 4) xyxy
        gt_valid: jnp.ndarray,  # (G,) bool
    ) -> jnp.ndarray:
        """(N,) bool — YOLO responsibility: the anchors of the grid cell
        containing a gt center (at every level) may own that gt."""
        cx = 0.5 * (gt_boxes[:, 0] + gt_boxes[:, 2])
        cy = 0.5 * (gt_boxes[:, 1] + gt_boxes[:, 3])
        flags = []
        for (h, w), s in zip(featmap_sizes, self.strides):
            gx = jnp.clip(jnp.floor(cx / s).astype(jnp.int32), 0, w - 1)
            gy = jnp.clip(jnp.floor(cy / s).astype(jnp.int32), 0, h - 1)
            gt_cell = gy * w + gx  # (G,)
            cells = jnp.arange(h * w, dtype=jnp.int32)
            hit = jnp.any(
                (cells[:, None] == gt_cell[None, :]) & gt_valid[None, :], axis=1
            )  # (H*W,)
            flags.append(jnp.repeat(hit, self.num_base_anchors))
        return jnp.concatenate(flags, axis=0)

    def featmap_sizes_for(self, pad_shape: Tuple[int, int]) -> List[Tuple[int, int]]:
        h, w = pad_shape
        return [(int(math.ceil(h / s)), int(math.ceil(w / s))) for s in self.strides]


@dataclasses.dataclass(frozen=True)
class SSDAnchorGenerator:
    """SSD-style per-level anchors (min/max size pairs + per-level ratios).

    mmdetection ``SSDAnchorGenerator`` geometry: each level l emits
      * a ``min_size`` square,
      * a ``sqrt(min*max)`` square,
      * for each aspect r in ``ratios[l]``: ``min_size`` boxes at r and 1/r,
    centered on ``(i + 0.5) * stride`` — 4 or 6 anchors per cell.  The
    interface mirrors ``AnchorGenerator`` except ``num_base_anchors`` is
    per-level (``num_base_anchors_per_level``).
    """

    strides: Tuple[int, ...] = (8, 16, 32, 64, 100, 300)
    min_sizes: Tuple[float, ...] = (21.0, 45.0, 99.0, 153.0, 207.0, 261.0)
    max_sizes: Tuple[float, ...] = (45.0, 99.0, 153.0, 207.0, 261.0, 315.0)
    ratios: Tuple[Tuple[float, ...], ...] = ((2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0,), (2.0,))

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors_per_level(self) -> Tuple[int, ...]:
        return tuple(2 + 2 * len(r) for r in self.ratios)

    def base_anchors_for_level(self, level: int) -> jnp.ndarray:
        s = float(self.min_sizes[level])
        big = math.sqrt(s * float(self.max_sizes[level]))
        c = 0.5 * float(self.strides[level])
        whs = [(s, s), (big, big)]
        for r in self.ratios[level]:
            sr = math.sqrt(r)
            whs.append((s * sr, s / sr))
            whs.append((s / sr, s * sr))
        rows = [(c - 0.5 * w, c - 0.5 * h, c + 0.5 * w, c + 0.5 * h) for w, h in whs]
        return jnp.asarray(rows, jnp.float32)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[jnp.ndarray]:
        assert len(featmap_sizes) == self.num_levels
        return [
            grid_anchors(self.base_anchors_for_level(i), featmap_sizes[i], self.strides[i])
            for i in range(self.num_levels)
        ]

    def flat_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> jnp.ndarray:
        return jnp.concatenate(self.grid_anchors(featmap_sizes), axis=0)

    def featmap_sizes_for(self, pad_shape: Tuple[int, int]) -> List[Tuple[int, int]]:
        h, w = pad_shape
        return [(int(math.ceil(h / s)), int(math.ceil(w / s))) for s in self.strides]
