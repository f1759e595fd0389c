"""Fused on-device image preprocessing (Pallas TPU kernel).

BASELINE.json's north star asks for the reference's normalize / pad chain
(``datasets/utils/image.py:87-105,326-347`` + ``dataset_transforms.py:29-44``)
fused into a single device kernel.  The TPU-native split of work:

  host   : jpeg decode + cv2 keep-ratio resize + flip + place on uint8 canvas
  wire   : transfer **uint8** (4x fewer bytes than float32 over PCIe/DMA)
  device : ONE Pallas kernel: u8 -> f32, (x - mean) / std, zero the padding
           region beyond each image's true (h, w), cast to compute dtype

Layout note: channels-last with C=3 would waste 125/128 VPU lanes, so the
kernel views each image as (H, W*C) — the mean/std vectors are pre-tiled to
period-C patterns along the lane dimension, making the whole op a dense
8x128-aligned elementwise pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ROW_BLOCK = 256  # rows per grid step; bounds VMEM to ~2.8MB per buffer


def _normalize_kernel(shape_ref, img_ref, mean_ref, inv_std_ref, out_ref):
    """One (image, row-block) per grid step: normalize + mask padding."""
    i = pl.program_id(0)
    r = pl.program_id(1)
    h = shape_ref[i, 0]
    w_elems = shape_ref[i, 1]  # valid width in flattened w*c elements

    # Mosaic has no direct u8->f32 cast; widen through int32 (free on the VPU)
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)
    y = (x - mean_ref[0]) * inv_std_ref[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + r * x.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mask = (rows < h) & (cols < w_elems)
    out_ref[0] = jnp.where(mask, y, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_normalize_pad(
    images_u8: jax.Array,  # (B, H, W, C) uint8, zero-padded canvases
    img_shapes: jax.Array,  # (B, 2) int32 valid (h, w) per image
    mean: Tuple[float, ...] = (123.675, 116.28, 103.53),
    std: Tuple[float, ...] = (58.395, 57.12, 57.375),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, H, W, C) ``out_dtype`` normalized images with zeroed pads."""
    b, h, w, c = images_u8.shape
    wc = w * c
    flat = images_u8.reshape(b, h, wc)

    mean_vec = jnp.tile(jnp.asarray(mean, jnp.float32), w).reshape(1, wc)
    inv_std_vec = jnp.tile(1.0 / jnp.asarray(std, jnp.float32), w).reshape(1, wc)
    # scalar-prefetched shapes: (h, w*c) per image
    shapes_flat = jnp.stack(
        [img_shapes[:, 0].astype(jnp.int32), img_shapes[:, 1].astype(jnp.int32) * c],
        axis=1,
    )

    row_block = min(_ROW_BLOCK, h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, pl.cdiv(h, row_block)),
        in_specs=[
            pl.BlockSpec((1, row_block, wc), lambda i, r, s: (i, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i, r, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i, r, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_block, wc), lambda i, r, s: (i, r, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _normalize_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, wc), out_dtype),
        interpret=interpret,
    )(shapes_flat, flat, mean_vec, inv_std_vec)
    return out.reshape(b, h, w, c)


def _normalize_kernel_s2d(shape_ref, img_ref, mean_ref, inv_std_ref, p_ref, col_ref, out_ref):
    """Row-block normalize on the 2x2 space-to-depth wire.

    Lane j holds s2d channel r = j % 12 of cell j // 12: sub-row p = r // 6
    and the original column index are precomputed per-lane int32 vectors, so
    the pad-validity test in ORIGINAL image coordinates stays a dense
    elementwise op: valid iff 2*row + p < h and orig_col < w.
    """
    i = pl.program_id(0)
    r = pl.program_id(1)
    h = shape_ref[i, 0]
    w = shape_ref[i, 1]

    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)
    y = (x - mean_ref[0]) * inv_std_ref[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + r * x.shape[0]
    mask = (2 * rows + p_ref[0] < h) & (col_ref[0] < w)
    out_ref[0] = jnp.where(mask, y, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_normalize_pad_s2d(
    images_s2d_u8: jax.Array,  # (B, H/2, W/2, 4C) uint8 s2d canvases
    img_shapes: jax.Array,  # (B, 2) int32 valid (h, w) in ORIGINAL coords
    mean: Tuple[float, ...] = (123.675, 116.28, 103.53),
    std: Tuple[float, ...] = (58.395, 57.12, 57.375),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, H/2, W/2, 4C) ``out_dtype`` normalized s2d images.

    The s2d wire variant of ``fused_normalize_pad`` for ``stem_s2d``
    backbones: the host does the (free, u8) 2x2 space-to-depth during
    canvas placement; this kernel only normalizes and masks — XLA-side
    relayout on device would cost 4+ ms at b8 800x1216 (measured r3).
    """
    b, h2, w2, c4 = images_s2d_u8.shape
    c = c4 // 4
    wc = w2 * c4
    flat = images_s2d_u8.reshape(b, h2, wc)

    mean12 = np.tile(np.asarray(mean, np.float32), 4)
    inv12 = np.tile(1.0 / np.asarray(std, np.float32), 4)
    mean_vec = jnp.asarray(np.tile(mean12, w2).reshape(1, wc))
    inv_std_vec = jnp.asarray(np.tile(inv12, w2).reshape(1, wc))
    lanes = np.arange(wc, dtype=np.int32)
    rlane = lanes % c4
    p_vec = jnp.asarray((rlane // (2 * c)).reshape(1, wc))
    q = (rlane % (2 * c)) // c
    col_vec = jnp.asarray((2 * (lanes // c4) + q).reshape(1, wc))
    shapes = jnp.asarray(img_shapes, jnp.int32)

    # s2d rows are 2x wider than the plain wire; quarter the row block to
    # keep the same VMEM footprint per grid step (128 OOMed by 68K at
    # wc=7296: the f32 widen + compare temps stack on the u8/out blocks)
    row_block = min(_ROW_BLOCK // 4, h2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, pl.cdiv(h2, row_block)),
        in_specs=[
            pl.BlockSpec((1, row_block, wc), lambda i, r, s: (i, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i, r, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i, r, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i, r, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i, r, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, row_block, wc), lambda i, r, s: (i, r, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _normalize_kernel_s2d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h2, wc), out_dtype),
        interpret=interpret,
    )(shapes, flat, mean_vec, inv_std_vec, p_vec, col_vec)
    return out.reshape(b, h2, w2, c4)


def space_to_depth_2x2_np(x: np.ndarray) -> np.ndarray:
    """Numpy twin of models.backbones.resnet.space_to_depth_2x2 (host wire)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    return (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )


def normalize_pad_reference(
    images_u8: np.ndarray,
    img_shapes: np.ndarray,
    mean=(123.675, 116.28, 103.53),
    std=(58.395, 57.12, 57.375),
) -> np.ndarray:
    """Numpy oracle for the kernel (same math as the host-side
    img_normalize + zero-pad semantics)."""
    out = (images_u8.astype(np.float32) - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    for i, (h, w) in enumerate(np.asarray(img_shapes)):
        out[i, int(h):, :, :] = 0.0
        out[i, :, int(w):, :] = 0.0
    return out
