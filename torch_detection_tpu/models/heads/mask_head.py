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

    TPU formulation: build a small avg-pool pyramid over the mask raster,
    keep it CHANNELS-LEADING (G, H_tot, w_max), and crop each roi's window
    from its MATCHED gt channel only — ``dynamic_slice`` on the leading dim
    is a contiguous block copy, so selecting the channel before the
    interpolation matmuls cuts the contraction work by G (=max_gts, ~100x)
    vs aligning all channels and ``take_along_axis``-ing afterwards (which
    cost ~60 ms of the 230 ms b4 Mask R-CNN train step; this path is ~1 ms).
    Rois route to the level where their extent is 0.5-1 cells per bilinear
    sample (``finest_scale=mask_size``) — Nyquist for the target raster.
    The naive full-resolution formulation before the pyramid materialized
    an (R, H, W) f32 tensor (~1 GB per image at COCO sizes) — ~350 ms.
    Target quality matches cv2's resize-then-threshold convention
    (bilinear on a mean pyramid then threshold 0.5 == area-weighted
    majority vote).  Per-channel numerics are identical to the all-channel
    formulation (the channel dim is never contracted).
    """
    from ...ops.roi_align import _window_geometry

    g, h, w = gt_masks.shape
    num_levels = 6
    s_ratio = 2
    # crop = c*M bounds the exactly-sampled roi aspect ratio at
    # ~((c*M-1)/(2*M))^2: 4*M covers aspect <= ~3.9; beyond it bilinear
    # samples clamp at the crop edge (quality degrades only at far tips).
    crop = 4 * mask_size

    # Pyramid WITHOUT a full-resolution bf16 copy (r4: u8 streams at only
    # ~134 GB/s on v5e, so the old `gt_masks.astype(bf16)` level-0
    # materialization plus reshape-mean chain cost 19.4 ms of a 27.4 ms
    # b4 target tier; this formulation measures ~half that, and the gt
    # channel dim is bucketed by the collate on top):
    #   * level 0 stays the RAW u8 tensor — level-0-routed rois slice their
    #     window from it directly and cast 112x112 at a time;
    #   * level 1 is EXACT u8 2x2 sums (binary masks: sum <= 4) * 0.25;
    #   * levels 2..5 are bf16 strided-add means.
    # Numerics: identical means (u8 sums are exact; bf16 (a+b)+(c+d) vs
    # mean() differ by <= 1 ulp as before).
    ph, pw = (-h) % 2, (-w) % 2
    mp = jnp.pad(gt_masks, ((0, 0), (0, ph), (0, pw)))
    s1 = mp[:, 0::2, :] + mp[:, 1::2, :]
    s1 = s1[:, :, 0::2] + s1[:, :, 1::2]
    feats_bf = [s1.astype(jnp.bfloat16) * jnp.bfloat16(0.25)]  # level 1
    for _ in range(num_levels - 2):
        f = feats_bf[-1]
        ph, pw = (-f.shape[1]) % 2, (-f.shape[2]) % 2
        f = jnp.pad(f, ((0, 0), (0, ph), (0, pw)))
        f = (f[:, 0::2, :] + f[:, 1::2, :])
        f = (f[:, :, 0::2] + f[:, :, 1::2]) * jnp.bfloat16(0.25)
        feats_bf.append(f)

    strides = tuple(2 ** i for i in range(num_levels))
    level_shapes = [(h, w)] + [f.shape[1:] for f in feats_bf]
    h_pads, w_max, starts, wy, wx = _window_geometry(
        level_shapes, rois, strides, out_size=mask_size,
        sampling_ratio=s_ratio, finest_scale=float(max(mask_size, 2)), crop=crop,
    )
    # flat holds levels 1..5 only; level-0 rois route to the raw u8 tensor.
    # _window_geometry clamps level-0 origins to [0, (h,w)-crop], so the raw
    # slice is always in-bounds; the "other" slice each roi also takes (the
    # raw one for level>=1 rois, the flat one for level-0 rois) lands on
    # dynamic_slice's auto-clamped junk and is discarded by the select.
    padded = [
        jnp.pad(f, ((0, 0), (0, h_pad - f.shape[1]), (0, w_max - f.shape[2])))
        for f, h_pad in zip(feats_bf, h_pads[1:])
    ]
    flat = jnp.concatenate(padded, axis=1)  # (G, H_tot(1..5), w_max)
    lvl0_rows = h_pads[0]
    raw = gt_masks
    if h < crop or w < crop:  # tiny rasters only; no-op at production sizes
        raw = jnp.pad(gt_masks, ((0, 0), (0, max(crop - h, 0)), (0, max(crop - w, 0))))

    def one(wy_r, wx_r, r0, c0, g_r):
        is_l0 = r0 < lvl0_rows
        win_u8 = jax.lax.dynamic_slice(raw, (g_r, r0, c0), (1, crop, crop))[0]
        win_bf = jax.lax.dynamic_slice(
            flat, (g_r, r0 - lvl0_rows, c0), (1, crop, crop)
        )[0]
        window = jnp.where(is_l0, win_u8.astype(flat.dtype), win_bf)
        tmp = jnp.einsum(
            "sh,hw->sw", wy_r.astype(flat.dtype), window,
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "sw,tw->st", tmp.astype(flat.dtype), wx_r.astype(flat.dtype),
            preferred_element_type=jnp.float32,
        )

    samples = jax.vmap(one)(
        wy, wx, starts[:, 0], starts[:, 1], matched_gt.astype(jnp.int32)
    )  # (R, S, S)
    r = rois.shape[0]
    sel = samples.reshape(r, mask_size, s_ratio, mask_size, s_ratio).mean((2, 4))
    return (sel >= 0.5).astype(jnp.float32)


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


def paste_masks_np(
    mask_probs,  # (R, M, M) numpy sigmoid probabilities
    boxes,  # (R, 4) xyxy in image coords
    img_shape: Tuple[int, int],
    threshold: float = 0.5,
):
    """Host-side (numpy) ``paste_masks`` for the evaluator -> (R, H, W) bool.

    Same sampling semantics as the jitted ``paste_masks`` (inverse bilinear,
    inclusive inside-box test), but computed per-roi over just the box's
    pixel window so arbitrary ORIGINAL image shapes never retrace/recompile
    anything — the segm evaluator calls this once per image at ``ori_shape``.
    """
    import numpy as np

    h, w = int(img_shape[0]), int(img_shape[1])
    probs = np.asarray(mask_probs, np.float32)
    boxes = np.asarray(boxes, np.float32)
    r = probs.shape[0]
    m = probs.shape[-1] if r else 1
    out = np.zeros((r, h, w), bool)
    for i in range(r):
        x1, y1, x2, y2 = boxes[i]
        bw = max(x2 - x1, 1.0)
        bh = max(y2 - y1, 1.0)
        xa = max(int(np.floor(x1)), 0)
        xb = min(int(np.ceil(x2)), w - 1)
        ya = max(int(np.floor(y1)), 0)
        yb = min(int(np.ceil(y2)), h - 1)
        if xb < xa or yb < ya:
            continue
        ys = np.arange(ya, yb + 1, dtype=np.float32)[:, None]
        xs = np.arange(xa, xb + 1, dtype=np.float32)[None, :]
        my = (ys - y1) / bh * m - 0.5
        mx = (xs - x1) / bw * m - 0.5
        y0 = np.floor(my)
        x0 = np.floor(mx)
        wy = my - y0
        wx = mx - x0
        y0i = np.clip(y0.astype(np.int32), 0, m - 1)
        y1i = np.clip(y0i + 1, 0, m - 1)
        x0i = np.clip(x0.astype(np.int32), 0, m - 1)
        x1i = np.clip(x0i + 1, 0, m - 1)
        p = probs[i]
        vals = (
            p[y0i, x0i] * (1 - wy) * (1 - wx)
            + p[y0i, x1i] * (1 - wy) * wx
            + p[y1i, x0i] * wy * (1 - wx)
            + p[y1i, x1i] * wy * wx
        )
        inside = (ys >= y1) & (ys <= y2) & (xs >= x1) & (xs <= x2)
        out[i, ya : yb + 1, xa : xb + 1] = (vals >= threshold) & inside
    return out
