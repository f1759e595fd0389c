"""FCN mask head (Mask R-CNN style) + fixed-shape mask targets/loss.

Completes the instance-segmentation path the reference only plumbs through
its datasets (mask parsing/transforms at ``datasets/utils/mask.py`` and
``dataset_transforms.py:69-98``; no mask model tier exists there).

TPU design: mask targets are produced by RoIAligning the padded (G, H, W)
gt-mask tensor at the sampled rois — the same fixed-shape bilinear gather as
feature RoIAlign, so target generation lives on-device inside the train
step (no host round trip, no dynamic shapes).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.losses import binary_cross_entropy
from ...ops.roi_align import roi_align
from ...utils.registry import HEADS

Dtype = Any


@HEADS.register_module
class FCNMaskHead(nn.Module):
    """4x conv3x3 -> 2x transposed-conv upsample -> 1x1 per-class logits.

    Input (B, R, S, S, C) roi features; output (B, R, 2S, 2S, num_classes).
    """

    num_classes: int
    in_channels: int = 256
    conv_channels: int = 256
    num_convs: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, roi_feats: jax.Array, train: bool = False) -> jax.Array:
        b, r, s, _, c = roi_feats.shape
        x = roi_feats.reshape(b * r, s, s, c)
        for i in range(self.num_convs):
            x = nn.relu(
                nn.Conv(self.conv_channels, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            )
        x = nn.relu(
            nn.ConvTranspose(
                self.conv_channels, (2, 2), strides=(2, 2), dtype=self.dtype, name="upsample"
            )(x)
        )
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="logits")(x)
        return x.reshape(b, r, 2 * s, 2 * s, self.num_classes)


def mask_targets_for_rois(
    gt_masks: jax.Array,  # (G, H, W) uint8, one image
    rois: jax.Array,  # (R, 4) image coords
    matched_gt: jax.Array,  # (R,) int32 index into G
    mask_size: int = 28,
) -> jax.Array:
    """Crop+resize each roi's matched gt mask to (R, mask_size, mask_size).

    Uses bilinear RoIAlign on the mask raster (threshold at 0.5 gives the
    binary target).
    """
    g = gt_masks.shape[0]
    onehot = jax.nn.one_hot(matched_gt, g, dtype=jnp.float32)  # (R, G)

    # align every gt mask at every roi would be (R*G) work; instead gather
    # the matched mask per roi first (G is small: max_gts)
    sel_masks = jnp.einsum("rg,ghw->rhw", onehot, gt_masks.astype(jnp.float32))

    def one(roi, mask):
        return roi_align(mask[..., None], roi[None], 1.0, out_size=mask_size, sampling_ratio=2)[0, ..., 0]

    out = jax.vmap(one)(rois, sel_masks)
    return (out >= 0.5).astype(jnp.float32)


def mask_loss(
    mask_logits: jax.Array,  # (B, R, M, M, C)
    mask_targets: jax.Array,  # (B, R, M, M) binary
    roi_labels: jax.Array,  # (B, R) 1-based class (0 = bg)
    roi_pos: jax.Array,  # (B, R) bool
) -> jax.Array:
    """BCE on the matched class's mask channel, averaged over positive rois."""
    num_classes = mask_logits.shape[-1]
    safe_cls = jnp.clip(roi_labels - 1, 0, num_classes - 1)
    logits = jnp.take_along_axis(
        mask_logits, safe_cls[..., None, None, None], axis=-1
    )[..., 0].astype(jnp.float32)
    w = roi_pos.astype(jnp.float32)[..., None, None]
    n = jnp.maximum(jnp.sum(roi_pos), 1.0) * mask_targets.shape[-1] * mask_targets.shape[-2]
    return binary_cross_entropy(logits, mask_targets, weight=w, avg_factor=n)


def paste_masks(
    mask_probs: jax.Array,  # (R, M, M) sigmoid probabilities for the det class
    boxes: jax.Array,  # (R, 4) xyxy in image coords
    img_shape: Tuple[int, int],
    threshold: float = 0.5,
) -> jax.Array:
    """Paste roi masks back onto the full image canvas -> (R, H, W) bool.

    Inverse bilinear sampling: for each image pixel, sample the roi mask at
    the corresponding normalized coordinate (vectorized, fixed-shape).
    """
    h, w = img_shape
    m = mask_probs.shape[-1]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # (1, H, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # (1, 1, W)
    x1 = boxes[:, 0][:, None, None]
    y1 = boxes[:, 1][:, None, None]
    bw = jnp.maximum(boxes[:, 2][:, None, None] - x1, 1.0)
    bh = jnp.maximum(boxes[:, 3][:, None, None] - y1, 1.0)
    # normalized roi coords in mask units
    my = (ys - y1) / bh * m - 0.5
    mx = (xs - x1) / bw * m - 0.5

    y0 = jnp.floor(my)
    x0 = jnp.floor(mx)
    wy = my - y0
    wx = mx - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, m - 1)
    y1i = jnp.clip(y0i + 1, 0, m - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, m - 1)
    x1i = jnp.clip(x0i + 1, 0, m - 1)

    def gather(probs, yi, xi):
        return probs[yi, xi]

    ridx = jnp.arange(mask_probs.shape[0])[:, None, None]
    f00 = mask_probs[ridx, y0i, x0i]
    f01 = mask_probs[ridx, y0i, x1i]
    f10 = mask_probs[ridx, y1i, x0i]
    f11 = mask_probs[ridx, y1i, x1i]
    vals = (
        f00 * (1 - wy) * (1 - wx)
        + f01 * (1 - wy) * wx
        + f10 * wy * (1 - wx)
        + f11 * wy * wx
    )
    inside = (ys >= y1) & (ys <= boxes[:, 3][:, None, None]) & (xs >= x1) & (
        xs <= boxes[:, 2][:, None, None]
    )
    return (vals >= threshold) & inside
