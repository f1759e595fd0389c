"""Pallas TPU RoIAlign: double-buffered window DMA + MXU interpolation.

The jnp fused kernel (``roi_align.multilevel_roi_align_fused``) materializes
per-roi (crop, crop, C) windows through vmapped ``dynamic_slice`` — XLA
lowers that to a gather running at ~1/5 of HBM bandwidth and round-trips the
3 GB of windows through HBM (measured 36 ms for 4x1000 rois @ 256ch on one
v5e).  This kernel instead:

  * keeps the flattened level pyramid in HBM and DMAs each roi's
    (crop, crop, C) window straight into VMEM, double-buffered so the next
    roi's DMA overlaps the current roi's compute (pallas_guide.md
    "Patterns: Double Buffering");
  * applies the separable bilinear interpolation as two small MXU matmuls
    on the VMEM-resident window — the window never touches HBM;
  * folds the sampling_ratio average-pool into the interpolation weights
    (the 2x2 sub-sample mean of separable products factorizes exactly into
    per-axis weight means), so the kernel emits (out, out, C) directly.

The weight/coordinate preparation is plain JAX (cheap, fused by XLA) and is
shared with the jnp implementation via ``roi_align._prepare_windows``.

Reference context: the upstream framework (TCGGroup/Torch_Detection) never
built an RoI tier (``models/__init__.py`` empty; SURVEY.md §2 #32-33); this
is the TPU-native design for it.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("crop", "crop_x", "out_size"))
def _roi_window_interp_pallas(
    flat: jax.Array,  # (H_tot, W_max, C) flattened pyramid
    starts: jax.Array,  # (R, 2) int32: (row_start, 8-aligned col_start)
    wy: jax.Array,  # (R, out, crop) pooled y interpolation weights
    wx: jax.Array,  # (R, out, crop_x)
    crop: int,
    crop_x: int,
    out_size: int,
) -> jax.Array:  # (R, out, out, C)
    r = starts.shape[0]
    c = flat.shape[-1]
    dtype = flat.dtype

    # TPU MXU default precision truncates f32 operands to bf16 mantissas;
    # keep f32 inputs exact (bf16 inputs use the native single-pass rate)
    precision = (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )

    def kernel(starts_ref, flat_ref, wy_ref, wx_ref, out_ref, win, sems):
        i = pl.program_id(0)

        def get_dma(slot, idx):
            r0 = starts_ref[idx, 0]
            c0 = starts_ref[idx, 1]
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(r0, crop), pl.ds(pl.multiple_of(c0, 8), crop_x), :],
                win.at[slot],
                sems.at[slot],
            )

        @pl.when(i == 0)
        def _():
            get_dma(0, 0).start()

        @pl.when(i + 1 < pl.num_programs(0))
        def _():
            get_dma((i + 1) % 2, i + 1).start()

        get_dma(i % 2, i).wait()
        window = win[i % 2]  # (crop, crop_x, C)

        # y-interp: (out, crop) @ (crop, crop_x*C) on the MXU, f32 accumulate
        tmp = jax.lax.dot_general(
            wy_ref[0],
            window.reshape(crop, crop_x * c),
            (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        ).reshape(out_size, crop_x, c).astype(dtype)
        # x-interp: contract the w axis -> (t, s, c), transpose to (s, t, c)
        out = jax.lax.dot_general(
            wx_ref[0],
            tmp,
            (((1,), (1,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        out_ref[0] = jnp.transpose(out, (1, 0, 2)).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # flat stays in HBM
            pl.BlockSpec((1, out_size, crop), lambda i, starts: (i, 0, 0)),
            pl.BlockSpec((1, out_size, crop_x), lambda i, starts: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, out_size, out_size, c), lambda i, starts: (i, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, crop, crop_x, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, out_size, out_size, c), dtype),
        grid_spec=grid_spec,
    )(starts, flat, wy, wx)


def multilevel_roi_align_pallas(
    feats: Sequence[jax.Array],  # per level (H_l, W_l, C), one image
    rois: jax.Array,  # (R, 4) image coords
    strides: Sequence[int],
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    crop: int = 40,
) -> jax.Array:
    """Drop-in replacement for ``multilevel_roi_align_fused`` (same exactness
    contract: rois spanning <= crop-1 cells at their routed level)."""
    from .roi_align import _prepare_windows

    # columns 8-aligned for Mosaic's sublane tiling; widen the x-crop so the
    # aligned window still covers every sampled column
    crop_x = crop + 8
    flat, starts, wy, wx = _prepare_windows(
        feats, rois, strides, out_size, sampling_ratio, finest_scale, crop,
        crop_x=crop_x, x_align=8,
    )
    # fold the sampling_ratio mean-pool into the separable weights
    r = rois.shape[0]
    wy_p = wy.reshape(r, out_size, sampling_ratio, crop).mean(2).astype(flat.dtype)
    wx_p = wx.reshape(r, out_size, sampling_ratio, crop_x).mean(2).astype(flat.dtype)
    return _roi_window_interp_pallas(flat, starts, wy_p, wx_p, crop, crop_x, out_size)
