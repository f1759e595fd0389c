"""Serving export: package a detector as a serialized StableHLO artifact.

Production-deployment tier (the reference has no serving story at all —
``models/__init__.py`` empty, no CLIs; SURVEY.md §2 #33).  The exported
artifact is a self-contained ``jax.export`` module: weights are baked in as
constants, the calling convention is fixed-shape
``(image_u8 (B, H, W, 3), img_shape (B, 2) i32, scale_factor (B,) f32)`` →
``{"boxes", "scores", "labels", "valid"[, "mask_probs"]}``, and it can be
loaded and invoked from any JAX process (same jaxlib ABI) with
``load_serving`` — no framework code needed at serving time.

The graph is the full production path: uint8 wire → on-device normalize +
pad-mask (Pallas on TPU, fused jnp elsewhere) → backbone/FPN/heads →
decode → class-wise NMS, one XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_MEAN = (123.675, 116.28, 103.53)
DEFAULT_STD = (58.395, 57.12, 57.375)


def _normalize_pad(images_u8, img_shapes, mean, std, out_dtype):
    """uint8 canvas -> normalized ``out_dtype`` with zeroed padding."""
    if jax.devices()[0].platform == "tpu":
        from ..ops.preprocess import fused_normalize_pad

        return fused_normalize_pad(
            images_u8, img_shapes, mean=mean, std=std, out_dtype=out_dtype
        )
    x = (images_u8.astype(jnp.float32) - jnp.asarray(mean, jnp.float32)) / jnp.asarray(
        std, jnp.float32
    )
    h, w = images_u8.shape[1:3]
    rows = jnp.arange(h)[None, :, None, None] < img_shapes[:, 0][:, None, None, None]
    cols = jnp.arange(w)[None, None, :, None] < img_shapes[:, 1][:, None, None, None]
    return jnp.where(rows & cols, x, 0.0).astype(out_dtype)


def _normalize_pad_s2d(images_s2d_u8, img_shapes, mean, std, out_dtype):
    """s2d uint8 wire -> normalized ``out_dtype`` with zeroed padding.

    Serving twin of data/collate's host-side space-to-depth: the caller
    ships (B, H/2, W/2, 4C) u8 canvases (ops.preprocess.space_to_depth_2x2_np
    on the plain canvas), avoiding the ~4 ms on-device relayout per b8
    800x1216 batch that an in-graph transpose would cost (measured r3).
    """
    if jax.devices()[0].platform == "tpu":
        from ..ops.preprocess import fused_normalize_pad_s2d

        return fused_normalize_pad_s2d(
            images_s2d_u8, img_shapes, mean=mean, std=std, out_dtype=out_dtype
        )
    b, h2, w2, c4 = images_s2d_u8.shape
    c = c4 // 4
    mean12 = jnp.tile(jnp.asarray(mean, jnp.float32), 4)
    std12 = jnp.tile(jnp.asarray(std, jnp.float32), 4)
    x = (images_s2d_u8.astype(jnp.float32) - mean12) / std12
    ch = jnp.arange(c4)
    p = (ch // (2 * c))[None, None, None, :]
    q = ((ch % (2 * c)) // c)[None, None, None, :]
    rows = 2 * jnp.arange(h2)[None, :, None, None] + p < img_shapes[:, 0][:, None, None, None]
    cols = 2 * jnp.arange(w2)[None, None, :, None] + q < img_shapes[:, 1][:, None, None, None]
    return jnp.where(rows & cols, x, 0.0).astype(out_dtype)


def make_serving_fn(
    model,
    det_cfg,
    variables,
    mean: Tuple[float, ...] = DEFAULT_MEAN,
    std: Tuple[float, ...] = DEFAULT_STD,
    compute_dtype=jnp.bfloat16,
    s2d_wire: bool = False,
) -> Callable:
    """Closed-over-weights inference callable (u8 canvas -> detections).

    ``s2d_wire=True`` (for ``stem_s2d`` backbones): the image input is the
    2x2 space-to-depth u8 canvas (B, H/2, W/2, 12); ``img_shape`` stays in
    original coordinates."""
    from ..models.detectors import (
        ATSSConfig,
        CascadeMaskRCNN,
        CascadeRCNNConfig,
        FasterRCNNConfig,
        FCOSConfig,
        MaskRCNN,
        SSDConfig,
        cascade_mask_rcnn_inference,
        cascade_rcnn_inference,
        decode_atss,
        decode_detections,
        decode_fcos,
        decode_ssd,
        decode_yolo,
        faster_rcnn_inference,
        mask_rcnn_inference,
    )
    from ..models.detectors import YOLOV3Config

    is_cascade_mask = isinstance(model, CascadeMaskRCNN)
    is_cascade = isinstance(det_cfg, CascadeRCNNConfig) and not is_cascade_mask
    is_two_stage = (
        isinstance(det_cfg, FasterRCNNConfig)
        and not is_cascade and not is_cascade_mask
    )
    is_mask = isinstance(model, MaskRCNN)
    is_ssd = isinstance(det_cfg, SSDConfig)
    is_fcos = isinstance(det_cfg, FCOSConfig)
    is_atss = isinstance(det_cfg, ATSSConfig)
    is_yolo = isinstance(det_cfg, YOLOV3Config)
    from ..models.detectors import CenterNetConfig, decode_centernet
    from ..models.detectors import GFLConfig, decode_gfl
    from ..models.detectors import DETRConfig, decode_detr

    from ..models.detectors import FoveaConfig, decode_fovea

    from ..models.detectors import PAAConfig, decode_paa

    from ..models.detectors import SparseRCNNConfig, decode_sparse_rcnn

    from ..models.detectors import SOLOV2Config, decode_solov2
    from ..models.detectors import YOLOXConfig, decode_yolox

    is_yolox = isinstance(det_cfg, YOLOXConfig)
    is_solo = isinstance(det_cfg, SOLOV2Config)
    is_sparse_rcnn = isinstance(det_cfg, SparseRCNNConfig)
    is_centernet = isinstance(det_cfg, CenterNetConfig)
    is_gfl = isinstance(det_cfg, GFLConfig)
    is_detr = isinstance(det_cfg, DETRConfig)
    is_fovea = isinstance(det_cfg, FoveaConfig)
    is_paa = isinstance(det_cfg, PAAConfig)

    def serve(image_u8, img_shape, scale_factor):
        if s2d_wire:
            x = _normalize_pad_s2d(image_u8, img_shape, mean, std, compute_dtype)
        else:
            x = _normalize_pad(image_u8, img_shape, mean, std, compute_dtype)
        shapes_f = img_shape.astype(jnp.float32)
        if is_yolox:
            cls, reg, obj = model.apply(variables, x)
            d = decode_yolox(
                det_cfg, cls, reg, obj,
                img_shapes=shapes_f, scale_factors=scale_factor,
            )
            return {
                "boxes": d.boxes, "scores": d.scores, "labels": d.labels,
                "valid": d.valid,
            }
        if is_solo:
            cls, kern, mfeat = model.apply(variables, x)
            d = decode_solov2(
                det_cfg, cls, kern, mfeat,
                img_shapes=shapes_f, scale_factors=scale_factor,
            )
            return {
                "boxes": d.boxes, "scores": d.scores, "labels": d.labels,
                "valid": d.valid, "mask_probs": d.mask_probs,
            }
        if is_cascade_mask:
            d = cascade_mask_rcnn_inference(
                det_cfg, model, variables, x,
                img_shapes=shapes_f, scale_factors=scale_factor,
            )
            return {
                "boxes": d.boxes, "scores": d.scores, "labels": d.labels,
                "valid": d.valid, "mask_probs": d.mask_probs,
            }
        if is_mask:
            d = mask_rcnn_inference(
                det_cfg, model, variables, x,
                img_shapes=shapes_f, scale_factors=scale_factor,
            )
            return {
                "boxes": d.boxes, "scores": d.scores, "labels": d.labels,
                "valid": d.valid, "mask_probs": d.mask_probs,
            }
        if is_cascade:
            d = cascade_rcnn_inference(
                det_cfg, model, variables, x,
                img_shapes=shapes_f, scale_factors=scale_factor,
            )
        elif is_two_stage:
            d = faster_rcnn_inference(
                det_cfg, model, variables, x,
                img_shapes=shapes_f, scale_factors=scale_factor,
            )
        elif is_fcos or is_atss or is_paa:
            cls, reg, ctr = model.apply(variables, x)
            decode3 = (decode_paa if is_paa
                       else decode_atss if is_atss else decode_fcos)
            d = decode3(
                det_cfg, cls, reg, ctr,
                img_shapes=shapes_f, scale_factors=scale_factor,
            )
        elif is_yolo:
            pred_maps = model.apply(variables, x)
            d = decode_yolo(
                det_cfg, pred_maps, img_shapes=shapes_f, scale_factors=scale_factor
            )
        elif is_centernet:
            heat, wh, off = model.apply(variables, x)
            d = decode_centernet(
                det_cfg, heat, wh, off,
                img_shapes=shapes_f, scale_factors=scale_factor,
            )
        elif is_ssd:
            cls, reg = model.apply(variables, x)
            d = decode_ssd(
                det_cfg, cls, reg, img_shapes=shapes_f, scale_factors=scale_factor
            )
        elif is_gfl:
            cls, reg = model.apply(variables, x)
            d = decode_gfl(
                det_cfg, cls, reg, img_shapes=shapes_f, scale_factors=scale_factor
            )
        elif is_fovea:
            cls, reg = model.apply(variables, x)
            d = decode_fovea(
                det_cfg, cls, reg, img_shapes=shapes_f, scale_factors=scale_factor
            )
        elif is_detr:
            cls, box = model.apply(variables, x, img_shapes=shapes_f)
            d = decode_detr(
                det_cfg, cls, box, img_shapes=shapes_f, scale_factors=scale_factor
            )
        elif is_sparse_rcnn:
            cls, box = model.apply(variables, x, img_shapes=shapes_f)
            d = decode_sparse_rcnn(
                det_cfg, cls, box, img_shapes=shapes_f, scale_factors=scale_factor
            )
        else:
            cls, reg = model.apply(variables, x)
            d = decode_detections(
                det_cfg, cls, reg, img_shapes=shapes_f, scale_factors=scale_factor
            )
        return {
            "boxes": d.boxes, "scores": d.scores,
            "labels": d.labels, "valid": d.valid,
        }

    return serve


def export_serving(
    model,
    det_cfg,
    variables,
    batch: int,
    canvas: Tuple[int, int],
    mean: Tuple[float, ...] = DEFAULT_MEAN,
    std: Tuple[float, ...] = DEFAULT_STD,
    compute_dtype=jnp.bfloat16,
    s2d_wire: bool = False,
):
    """Lower + export the serving function for the current platform.

    Returns a ``jax.export.Exported``; ``.serialize()`` gives the portable
    artifact bytes.  With ``s2d_wire`` the image input spec becomes the
    (B, H/2, W/2, 12) space-to-depth u8 canvas.
    """
    serve = make_serving_fn(model, det_cfg, variables, mean, std, compute_dtype,
                            s2d_wire=s2d_wire)
    if s2d_wire:
        img_spec = jax.ShapeDtypeStruct(
            (batch, canvas[0] // 2, canvas[1] // 2, 12), jnp.uint8
        )
    else:
        img_spec = jax.ShapeDtypeStruct((batch, canvas[0], canvas[1], 3), jnp.uint8)
    specs = (
        img_spec,
        jax.ShapeDtypeStruct((batch, 2), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.float32),
    )
    return jax.export.export(jax.jit(serve))(*specs)


def save_serving(exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_serving(path: str) -> Callable:
    """Load a serialized artifact -> callable(image_u8, img_shape, scale)."""
    with open(path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))

    def call(image_u8, img_shape, scale_factor):
        return exported.call(
            jnp.asarray(image_u8), jnp.asarray(img_shape), jnp.asarray(scale_factor)
        )

    return call
