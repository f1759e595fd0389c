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
from typing import Optional, Sequence, Tuple

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


def _window_geometry(
    shapes: Sequence[Tuple[int, int]],  # per level (H_l, W_l)
    rois: jax.Array,  # (R, 4) image coords
    strides: Sequence[int],
    out_size: int,
    sampling_ratio: int,
    finest_scale: float,
    crop: int,
    crop_x: Optional[int] = None,
    x_align: int = 1,
    y_align: int = 1,
) -> Tuple[Sequence[int], int, jax.Array, jax.Array, jax.Array]:
    """Window coordinate/weight math shared by every window-cropped RoIAlign
    (fused jnp, Pallas, mask targets) — shapes-only, no feature data.

    Returns (per-level padded heights ``h_pads``, padded width ``w_max``,
    starts (R, 2) int32 incl. the level row offset, wy (R, S, crop),
    wx (R, S, crop_x) bilinear weights).  The flattened pyramid the starts
    index into pads each level's width to ``w_max``, its height to
    ``h_pads[l]``, and concatenates along rows."""
    num_levels = len(shapes)
    crop_x = crop_x or crop

    w_max = max(max(w_l for _, w_l in shapes), crop, crop_x)
    row_offsets = []
    h_pads = []
    heights = []
    widths = []
    off = 0
    for h_l, w_l in shapes:
        h_pad = max(h_l, crop)
        if y_align > 1:
            h_pad = ((h_pad + y_align - 1) // y_align) * y_align
        row_offsets.append(off)
        h_pads.append(h_pad)
        heights.append(h_l)
        widths.append(w_l)
        off += h_pad

    s = out_size * sampling_ratio
    levels = map_rois_to_levels(rois, num_levels, finest_scale)  # (R,)
    stride_arr = jnp.asarray(strides, jnp.float32)[levels]  # (R,)
    h_arr = jnp.asarray(heights, jnp.float32)[levels]
    w_arr = jnp.asarray(widths, jnp.float32)[levels]
    off_arr = jnp.asarray(row_offsets, jnp.float32)[levels]

    # sample coordinates in level cells (same math as roi_align)
    inv = 1.0 / stride_arr
    x1 = rois[:, 0] * inv
    y1 = rois[:, 1] * inv
    rw = jnp.maximum(rois[:, 2] * inv - x1, 1.0)
    rh = jnp.maximum(rois[:, 3] * inv - y1, 1.0)
    grid = (jnp.arange(s, dtype=jnp.float32) + 0.5) / sampling_ratio
    ys = y1[:, None] + (rh / out_size)[:, None] * grid[None, :]  # (R, S)
    xs = x1[:, None] + (rw / out_size)[:, None] * grid[None, :]

    def axis_weights(coords, dim_size, origin, width):
        """Bilinear weights over the crop window -> (R, S, width)."""
        c0 = jnp.floor(coords)
        t = coords - c0
        c0i = jnp.clip(c0.astype(jnp.int32), 0, (dim_size - 1)[:, None].astype(jnp.int32))
        c1i = jnp.clip(c0i + 1, 0, (dim_size - 1)[:, None].astype(jnp.int32))
        l0 = jnp.clip(c0i - origin[:, None].astype(jnp.int32), 0, width - 1)
        l1 = jnp.clip(c1i - origin[:, None].astype(jnp.int32), 0, width - 1)
        w0 = jax.nn.one_hot(l0, width, dtype=jnp.float32) * (1.0 - t)[..., None]
        w1 = jax.nn.one_hot(l1, width, dtype=jnp.float32) * t[..., None]
        return w0 + w1

    origin_y = jnp.clip(jnp.floor(ys[:, 0]), 0.0, jnp.maximum(h_arr - crop, 0.0))
    if y_align > 1:
        origin_y = jnp.floor(origin_y / y_align) * y_align
    # clamp with the WIDENED x-crop so the aligned window never runs past
    # the padded pyramid width
    origin_x = jnp.clip(jnp.floor(xs[:, 0]), 0.0, jnp.maximum(w_arr - crop_x, 0.0))
    if x_align > 1:
        origin_x = jnp.floor(origin_x / x_align) * x_align
    wy = axis_weights(ys, h_arr, origin_y, crop)  # (R, S, crop)
    wx = axis_weights(xs, w_arr, origin_x, crop_x)  # (R, S, crop_x)

    row_start = (off_arr + origin_y).astype(jnp.int32)  # (R,)
    col_start = origin_x.astype(jnp.int32)
    return h_pads, w_max, jnp.stack([row_start, col_start], axis=-1), wy, wx


def _prepare_windows(
    feats: Sequence[jax.Array],  # per level (H_l, W_l, C), one image
    rois: jax.Array,  # (R, 4) image coords
    strides: Sequence[int],
    out_size: int,
    sampling_ratio: int,
    finest_scale: float,
    crop: int,
    crop_x: Optional[int] = None,
    x_align: int = 1,
    y_align: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Shared window/weight prep for the fused jnp and Pallas RoIAlign:
    returns (flat pyramid (H_tot, w_max, C), starts (R, 2) int32 incl. the
    level row offset, wy (R, S, crop), wx (R, S, crop_x) bilinear weights).

    ``x_align``/``y_align`` floor the column/row origins to a multiple
    (Mosaic requires aligned offsets when slicing a tiled dim); pair an
    alignment with a crop widened by it so coverage is preserved.  With
    ``y_align`` the per-level row offsets in the flattened pyramid are also
    rounded up so absolute row starts stay aligned."""
    h_pads, w_max, starts, wy, wx = _window_geometry(
        [f.shape[:2] for f in feats], rois, strides, out_size, sampling_ratio,
        finest_scale, crop, crop_x, x_align, y_align,
    )
    padded = [
        jnp.pad(f, ((0, h_pad - f.shape[0]), (0, w_max - f.shape[1]), (0, 0)))
        for f, h_pad in zip(feats, h_pads)
    ]
    flat = jnp.concatenate(padded, axis=0)  # (H_tot, w_max, C)
    return flat, starts, wy, wx


def _weight_support(w: jax.Array) -> jax.Array:
    """Per-roi extent of nonzero interpolation weight: (R, S, width) -> (R,).

    Bilinear weights outside a roi's sampled span are exactly 0 (one-hot
    construction), so rows/cols beyond the support contribute nothing to the
    interpolation matmuls — a window DMA may skip them."""
    width = w.shape[-1]
    nz = jnp.any(w != 0.0, axis=1)  # (R, width)
    idx = jnp.arange(1, width + 1, dtype=jnp.int32)
    return jnp.max(jnp.where(nz, idx, 0), axis=-1)  # (R,)


def multilevel_roi_align_fused(
    feats: Sequence[jax.Array],  # per level (H_l, W_l, C), one image
    rois: jax.Array,  # (R, 4) image coords
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    crop: int = 40,
    roi_chunk: int = 256,
) -> jax.Array:
    """Fast RoIAlign: per-roi window crop + interpolation matmuls.

    The gather formulation (``multilevel_roi_align``) issues per-sample
    gathers — irregular memory traffic the TPU hates (~200 ms for 4x1000
    rois).  This version exploits the FPN routing invariant (a roi spans at
    most ~crop cells at its routed level) to:

      1. stack all levels into one flattened pyramid (rows concatenated,
         width padded) so every roi crops from ONE array;
      2. ``dynamic_slice`` a (crop, crop, C) window per roi — batched
         dynamic-slices lower to regular block gathers;
      3. interpolate with two small dense matmuls (MXU) instead of gathers:
         samples = Wy @ window @ Wx^T, then 2x2 average-pool.

    Exact vs the gather version for rois spanning <= crop-1 cells at their
    level (everything FPN routing produces except extreme >4:1 aspect
    giants, whose edge samples clamp to the window).
    """
    dtype = feats[0].dtype
    c = feats[0].shape[-1]
    s = out_size * sampling_ratio
    flat, starts, wy, wx = _prepare_windows(
        feats, rois, strides, out_size, sampling_ratio, finest_scale, crop
    )
    row_start = starts[:, 0]
    col_start = starts[:, 1]

    def chunk_fn(args):
        wy_c, wx_c, rs_c, cs_c = args

        # f32 inputs keep exact MXU passes (TPU default truncates operands
        # to bf16 mantissas); bf16 inputs use the native single-pass rate
        prec = (
            jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )

        def one(wy_r, wx_r, r0, c0):
            # keep the einsums in the feature dtype (bf16 in prod -> native
            # MXU rate) with f32 accumulation; intermediate rounds to the
            # feature dtype, which is the standard mixed-precision contract
            window = jax.lax.dynamic_slice(flat, (r0, c0, 0), (crop, crop, c))
            tmp = jnp.einsum(
                "sh,hwc->swc", wy_r.astype(dtype), window,
                precision=prec, preferred_element_type=jnp.float32,
            )
            return jnp.einsum(
                "swc,tw->stc", tmp.astype(dtype), wx_r.astype(dtype),
                precision=prec, preferred_element_type=jnp.float32,
            )

        return jax.vmap(one)(wy_c, wx_c, rs_c, cs_c)

    r = rois.shape[0]
    if r % roi_chunk == 0 and r > roi_chunk:
        n_chunks = r // roi_chunk
        reshaped = (
            wy.reshape(n_chunks, roi_chunk, s, crop),
            wx.reshape(n_chunks, roi_chunk, s, crop),
            row_start.reshape(n_chunks, roi_chunk),
            col_start.reshape(n_chunks, roi_chunk),
        )
        samples = jax.lax.map(chunk_fn, reshaped).reshape(r, s, s, c)
    else:
        samples = chunk_fn((wy, wx, row_start, col_start))

    samples = samples.reshape(r, out_size, sampling_ratio, out_size, sampling_ratio, c)
    return samples.mean(axis=(2, 4)).astype(dtype)


def batched_multilevel_roi_align(
    feats: Sequence[jax.Array],  # per level (B, H_l, W_l, C)
    rois: jax.Array,  # (B, R, 4)
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    impl: str = "pallas",
) -> jax.Array:
    """(B, R, out, out, C) aligned features.

    ``impl='pallas'`` (default, TPU) DMAs windows straight into VMEM with
    the interpolation on the MXU; ``'fused'`` is the pure-jnp crop+matmul
    kernel (and the automatic fallback off-TPU); ``'gather'`` is the
    per-sample gather oracle.
    """
    if impl == "pallas" and (
        jax.devices()[0].platform != "tpu" or feats[0].shape[-1] % 128 != 0
    ):
        # Mosaic only lowers on TPU, and the in-kernel (crop, crop_x*C)
        # reshape needs full 128-lane channel tiles
        impl = "fused"
    if impl == "pallas":
        from .roi_align_pallas import multilevel_roi_align_pallas as fn
    elif impl == "fused":
        fn = multilevel_roi_align_fused
    else:
        fn = multilevel_roi_align

    def one_image(i):
        return fn(
            [f[i] for f in feats], rois[i], strides, out_size, sampling_ratio, finest_scale
        )

    return jax.vmap(one_image)(jnp.arange(rois.shape[0]))
