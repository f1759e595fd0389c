"""Test-time augmentation: multi-scale x flip inference with box fusion.

Implements the TTA semantics defined by the reference's test prep
(``datasets/base_dataset.py:188-275``, SURVEY.md §3.2): each image yields one
(scale, flip) variant per configured size (x2 when flip_ratio > 0); each
variant's detections are mapped back to ORIGINAL image coordinates using the
``img_meta`` contract (scale_factor, flipped_flag), concatenated, and fused
with one final class-wise NMS.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from ..data.ops.bbox import bbox_flip


def debox_to_original(
    boxes: np.ndarray, meta: Dict
) -> np.ndarray:
    """Map detector-output boxes (in the augmented image frame) back to the
    original image frame: unflip in the resized frame, then unscale."""
    if meta.get("flipped_flag"):
        boxes = bbox_flip(
            boxes, tuple(meta["img_shape"][:2]), True, meta.get("flipped_direction", "horizontal")
        )
    return boxes / float(meta["scale_factor"])


def merge_tta_detections(
    per_aug: Sequence[Dict[str, np.ndarray]],
    metas: Sequence[Dict],
    iou_thr: float = 0.5,
    max_out: int = 100,
    extras: Optional[Sequence[np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Fuse detections from several augmentations of ONE image.

    per_aug[i]: {'boxes', 'scores', 'labels'} in the i-th augmented frame.
    Returns fused detections in original-image coordinates.

    ``extras`` (optional): one per-aug array aligned row-for-row with that
    aug's boxes (e.g. unflipped mask prob patches).  NMS fusion SELECTS
    candidates rather than averaging them, so each kept detection has a
    unique source row; the fused dict then carries ``extras`` gathered for
    the kept detections — this is how segm TTA keeps mask provenance
    through box fusion.
    """
    import jax.numpy as jnp

    from ..ops.nms import multiclass_nms

    all_boxes, all_scores, all_labels, all_extras = [], [], [], []
    for a, (det, meta) in enumerate(zip(per_aug, metas)):
        if len(det["boxes"]) == 0:
            continue
        all_boxes.append(debox_to_original(np.asarray(det["boxes"]), meta))
        all_scores.append(np.asarray(det["scores"]))
        all_labels.append(np.asarray(det["labels"]))
        if extras is not None:
            all_extras.append(np.asarray(extras[a]))
    if not all_boxes:
        out = dict(
            boxes=np.zeros((0, 4), np.float32),
            scores=np.zeros((0,), np.float32),
            labels=np.zeros((0,), np.int32),
        )
        if extras is not None:
            shape = np.asarray(extras[0]).shape[1:] if len(extras) else ()
            out["extras"] = np.zeros((0,) + tuple(shape), np.float32)
        return out
    boxes = np.concatenate(all_boxes).astype(np.float32)
    scores = np.concatenate(all_scores).astype(np.float32)
    labels = np.concatenate(all_labels).astype(np.int32)

    num_classes = int(labels.max()) + 1
    score_matrix = np.zeros((len(boxes), num_classes), np.float32)
    score_matrix[np.arange(len(boxes)), labels] = scores
    res = multiclass_nms(
        jnp.asarray(boxes),
        jnp.asarray(score_matrix),
        iou_thr=iou_thr,
        score_thr=0.0,
        pre_nms_top_k=min(len(boxes), 1000),
        max_out=max_out,
    )
    valid = np.asarray(res.valid)
    out = dict(
        boxes=np.asarray(res.boxes)[valid],
        scores=np.asarray(res.scores)[valid],
        labels=np.asarray(res.labels)[valid],
    )
    if extras is not None:
        cat = np.concatenate(all_extras)
        src = np.asarray(res.indices)[valid]
        out["extras"] = cat[src]
    return out


def masks_to_original(
    mask_probs: np.ndarray,  # (D, M, M) probs in the augmented frame
    boxes: np.ndarray,  # (D, 4) xyxy in the augmented frame
    meta: Dict,
    threshold: float = 0.5,
):
    """Map per-detection mask probs back to the ORIGINAL image frame.

    Flipping the input image mirrors its content, so a detection's (M, M)
    mask patch must be mirrored back before pasting at the unflipped box.
    Returns ``(masks (D, oh, ow) bool, boxes (D, 4) original-frame)``.
    """
    from ..models.heads import paste_masks_np

    probs = np.asarray(mask_probs, np.float32)
    if meta.get("flipped_flag"):
        if meta.get("flipped_direction", "horizontal") == "horizontal":
            probs = probs[:, :, ::-1]
        else:
            probs = probs[:, ::-1, :]
    boxes = debox_to_original(np.asarray(boxes), meta)
    oh, ow = meta["ori_shape"][:2]
    return paste_masks_np(probs, boxes, (oh, ow), threshold=threshold), boxes
