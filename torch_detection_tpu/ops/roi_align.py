"""RoIAlign (NHWC, pure jnp, fixed shapes) + FPN level routing.

The reference's two-stage tier was never implemented (its datasets carry
proposal plumbing, ``base_dataset.py:100-105,193-200``, but no RoI ops);
this is the TPU-native design:

  * bilinear sampling is expressed as four gathers + a weighted sum over a
    static (out*ratio)^2 sample grid — everything vmaps over rois, no
    data-dependent shapes;
  * FPN level routing avoids dynamic partitioning: features are aligned
    against EVERY level and blended with a one-hot level weight.  That is
    4x the FLOPs of a gather-based router, but each per-level pass is a
    dense vectorized op — on TPU this wins over scatter/gather irregularity
    for the typical R<=1024 roi budget.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample feat (H, W, C) at float coords (ys, xs) of shape (S,) -> (S, C).

    Out-of-range coordinates clamp to the border (torchvision RoIAlign
    semantics with aligned=False use zero-padding outside; rois are clipped
    upstream so the difference only affects boxes at the image edge).
    """
    h, w, _ = feat.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0

    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    f00 = feat[y0i, x0i]
    f01 = feat[y0i, x1i]
    f10 = feat[y1i, x0i]
    f11 = feat[y1i, x1i]
    wy1 = wy1[:, None]
    wx1 = wx1[:, None]
    return (
        f00 * (1 - wy1) * (1 - wx1)
        + f01 * (1 - wy1) * wx1
        + f10 * wy1 * (1 - wx1)
        + f11 * wy1 * wx1
    )


def roi_align(
    feat: jax.Array,  # (H, W, C) one image, one level
    rois: jax.Array,  # (R, 4) xyxy in IMAGE coordinates
    spatial_scale: float,
    out_size: int = 7,
    sampling_ratio: int = 2,
) -> jax.Array:
    """Aligned roi features (R, out, out, C)."""
    r = rois.shape[0]
    s = sampling_ratio
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)
    bin_w = rw / out_size
    bin_h = rh / out_size

    # static sample grid: (out*s) points along each axis at bin sub-centers
    grid = (jnp.arange(out_size * s, dtype=jnp.float32) + 0.5) / s  # in bin units
    ys = y1[:, None] + bin_h[:, None] * grid[None, :]  # (R, out*s)
    xs = x1[:, None] + bin_w[:, None] * grid[None, :]

    def one_roi(ys_r, xs_r):
        yy = jnp.repeat(ys_r, out_size * s)  # (S^2,) row-major
        xx = jnp.tile(xs_r, out_size * s)
        samples = _bilinear_sample(feat, yy, xx)  # (S^2, C)
        samples = samples.reshape(out_size, s, out_size, s, -1)
        return samples.mean(axis=(1, 3))  # (out, out, C)

    return jax.vmap(one_roi)(ys, xs)


def map_rois_to_levels(
    rois: jax.Array,  # (R, 4)
    num_levels: int,
    finest_scale: float = 56.0,
    offset: float = 1.0,
) -> jax.Array:
    """mmdet-style level router: level = floor(log2(sqrt(wh)/finest_scale)),
    clamped to [0, num_levels-1].  Returns (R,) int32."""
    w = rois[:, 2] - rois[:, 0] + offset
    h = rois[:, 3] - rois[:, 1] + offset
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(
    feats: Sequence[jax.Array],  # per level (H_l, W_l, C), one image
    rois: jax.Array,  # (R, 4) image coords
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
) -> jax.Array:
    """FPN RoIAlign: align on every level, blend with the one-hot router.

    Dense-over-sparse: computing all levels keeps every op a fixed-shape
    vectorized gather; the one-hot blend zeroes the 3 unused levels.
    """
    levels = map_rois_to_levels(rois, len(feats), finest_scale)
    onehot = jax.nn.one_hot(levels, len(feats), dtype=feats[0].dtype)  # (R, L)
    out = None
    for lvl, (feat, stride) in enumerate(zip(feats, strides)):
        aligned = roi_align(feat, rois, 1.0 / stride, out_size, sampling_ratio)
        weighted = aligned * onehot[:, lvl][:, None, None, None]
        out = weighted if out is None else out + weighted
    return out


def batched_multilevel_roi_align(
    feats: Sequence[jax.Array],  # per level (B, H_l, W_l, C)
    rois: jax.Array,  # (B, R, 4)
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
) -> jax.Array:
    """(B, R, out, out, C) aligned features."""

    def one_image(i):
        return multilevel_roi_align(
            [f[i] for f in feats], rois[i], strides, out_size, sampling_ratio, finest_scale
        )

    return jax.vmap(one_image)(jnp.arange(rois.shape[0]))
