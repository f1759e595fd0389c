"""Fused on-device image preprocessing.

BASELINE.json's north star asks for the reference's normalize / pad chain
(``datasets/utils/image.py:87-105,326-347`` + ``dataset_transforms.py:29-44``)
fused into a single device kernel.  The TPU-native split of work:

  host   : jpeg decode + cv2 keep-ratio resize + flip + place on uint8 canvas
  wire   : transfer **uint8** (4x fewer bytes than float32 over PCIe/DMA)
  device : ONE fused elementwise pass: u8 -> f32, (x - mean) / std, zero the
           padding region beyond each image's true (h, w), cast to compute
           dtype

Implementation note (r4, measured — do not rediscover): this op is LOWERED
BY XLA, not Pallas.  The r2 hand-written Mosaic kernel bottomed out at
~5.2-5.8 ms @ b32 800x1216 regardless of per-element op count (Mosaic's
u8 -> i32 -> f32 widen chain runs ~48 GB/s effective); the identical math as
a plain jnp expression compiles to one XLA fusion at 2.8 ms.  The u8 wire +
on-device normalize design (vs the r1 f32 host wire) is what matters — the
kernel authorship is not.  Numerics are bit-identical to the old kernel:
u8 -> f32 is exact and the op order ``(x - mean) * inv_std`` is unchanged.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_normalize_pad(
    images_u8: jax.Array,  # (B, H, W, C) uint8, zero-padded canvases
    img_shapes: jax.Array,  # (B, 2) int32 valid (h, w) per image
    mean: Tuple[float, ...] = (123.675, 116.28, 103.53),
    std: Tuple[float, ...] = (58.395, 57.12, 57.375),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,  # kept for API compat with the r2 Pallas kernel
) -> jax.Array:
    """Returns (B, H, W, C) ``out_dtype`` normalized images with zeroed pads."""
    del interpret
    b, h, w, c = images_u8.shape
    mean_v = jnp.asarray(mean, jnp.float32)
    inv_v = 1.0 / jnp.asarray(std, jnp.float32)
    sh = jnp.asarray(img_shapes, jnp.int32)

    x = images_u8.astype(jnp.float32)
    y = (x - mean_v) * inv_v
    rows = jnp.arange(h, dtype=jnp.int32)[None, :, None, None]
    cols = jnp.arange(w, dtype=jnp.int32)[None, None, :, None]
    m = (rows < sh[:, 0, None, None, None]) & (cols < sh[:, 1, None, None, None])
    return jnp.where(m, y, 0.0).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def fused_normalize_pad_s2d(
    images_s2d_u8: jax.Array,  # (B, H/2, W/2, 4C) uint8 s2d canvases
    img_shapes: jax.Array,  # (B, 2) int32 valid (h, w) in ORIGINAL coords
    mean: Tuple[float, ...] = (123.675, 116.28, 103.53),
    std: Tuple[float, ...] = (58.395, 57.12, 57.375),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,  # kept for API compat with the r2 Pallas kernel
) -> jax.Array:
    """Returns (B, H/2, W/2, 4C) ``out_dtype`` normalized s2d images.

    The s2d wire variant of ``fused_normalize_pad`` for ``stem_s2d``
    backbones: the host does the (free, u8) 2x2 space-to-depth during
    canvas placement; this op only normalizes and masks.  s2d channel
    r = ch % 4C holds sub-row p = r // (2C), sub-col q = (r % 2C) // C of
    the original 2x2 cell, so validity in ORIGINAL coords is
    ``2*row + p < h  and  2*col + q < w``.
    """
    del interpret
    b, h2, w2, c4 = images_s2d_u8.shape
    c = c4 // 4
    mean_v = jnp.asarray(np.tile(np.asarray(mean, np.float32), 4))
    inv_v = jnp.asarray(np.tile(1.0 / np.asarray(std, np.float32), 4))
    sh = jnp.asarray(img_shapes, jnp.int32)

    ch = np.arange(c4, dtype=np.int32)
    p = jnp.asarray(ch // (2 * c))[None, None, None, :]
    q = jnp.asarray((ch % (2 * c)) // c)[None, None, None, :]

    x = images_s2d_u8.astype(jnp.float32)
    y = (x - mean_v) * inv_v
    rows = jnp.arange(h2, dtype=jnp.int32)[None, :, None, None]
    cols = jnp.arange(w2, dtype=jnp.int32)[None, None, :, None]
    m = (2 * rows + p < sh[:, 0, None, None, None]) & (
        2 * cols + q < sh[:, 1, None, None, None]
    )
    return jnp.where(m, y, 0.0).astype(out_dtype)


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
    """Numpy oracle for the fused op (same math as the host-side
    img_normalize + zero-pad semantics)."""
    out = (images_u8.astype(np.float32) - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    for i, (h, w) in enumerate(np.asarray(img_shapes)):
        out[i, int(h):, :, :] = 0.0
        out[i, :, int(w):, :] = 0.0
    return out
