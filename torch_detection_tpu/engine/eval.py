"""Detection evaluation: COCO-style mAP and VOC-style AP, numpy, native.

The reference has no eval code (SURVEY.md §2 #32/33 [ABSENT]; pycocotools is
also unavailable in this environment), so this is a from-scratch
implementation of the standard protocols:

  * COCO: per-class PR curves matched greedily by descending score at IoU
    thresholds 0.50:0.05:0.95, 101-point interpolated AP, area ranges
    (all/small/medium/large), maxDets=100, crowd boxes as ignore regions.
  * VOC: 11-point (VOC2007) or all-point (VOC2010+) AP at IoU 0.5 with
    difficult-box ignoring.

Box convention: xyxy with the inclusive +1 area rule used across the
framework (reference ``datasets/utils/bbox.py:39``).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _iou_matrix(det: np.ndarray, gt: np.ndarray, offset: float = 1.0) -> np.ndarray:
    if det.size == 0 or gt.size == 0:
        return np.zeros((len(det), len(gt)))
    lt = np.maximum(det[:, None, :2], gt[None, :, :2])
    rb = np.minimum(det[:, None, 2:4], gt[None, :, 2:4])
    wh = np.clip(rb - lt + offset, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (det[:, 2] - det[:, 0] + offset) * (det[:, 3] - det[:, 1] + offset)
    a2 = (gt[:, 2] - gt[:, 0] + offset) * (gt[:, 3] - gt[:, 1] + offset)
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-9)


def _box_area(boxes: np.ndarray, offset: float = 1.0) -> np.ndarray:
    if boxes.size == 0:
        return np.zeros((0,))
    return (boxes[:, 2] - boxes[:, 0] + offset) * (boxes[:, 3] - boxes[:, 1] + offset)


COCO_AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def _match_image(
    det_boxes: np.ndarray,  # (D, 4) sorted by descending score
    gt_boxes: np.ndarray,  # (G, 4)
    gt_ignore: np.ndarray,  # (G,) bool (crowd / outside area range)
    ignore_regions: np.ndarray,  # (R, 4) crowd boxes (match allowed, not scored)
    iou_thr: float,
    iou: Optional[np.ndarray] = None,  # precomputed (D, G), e.g. mask IoU
    iou_crowd: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy matching. Returns (det_matched, det_ignored) bool arrays.

    Dispatches to the C++ matcher (``native/eval_match.cpp``) when built
    (box path only); this python version is the semantic oracle, the
    fallback, and the path for precomputed (mask) IoU matrices.
    """
    if iou is None:
        from .. import native

        res = native.match_image(det_boxes, gt_boxes, gt_ignore, ignore_regions, iou_thr)
        if res is not None:
            return res
        iou = _iou_matrix(det_boxes, gt_boxes)
        iou_crowd = _iou_matrix(det_boxes, ignore_regions) if len(ignore_regions) else None
    d = len(det_boxes)
    g = len(gt_boxes)
    matched = np.zeros(d, bool)
    det_ignored = np.zeros(d, bool)
    gt_taken = np.zeros(g, bool)

    for i in range(d):
        best_j = -1
        best_iou = iou_thr
        # prefer non-ignored gts; an ignored gt can still absorb the det
        best_ignored_j = -1
        best_ignored_iou = iou_thr
        for j in range(g):
            if gt_taken[j] or iou[i, j] < iou_thr:
                continue
            if gt_ignore[j]:
                if iou[i, j] > best_ignored_iou:
                    best_ignored_iou = iou[i, j]
                    best_ignored_j = j
            elif iou[i, j] > best_iou or best_j < 0:
                best_iou = iou[i, j]
                best_j = j
        if best_j >= 0:
            matched[i] = True
            gt_taken[best_j] = True
        elif best_ignored_j >= 0:
            det_ignored[i] = True
            gt_taken[best_ignored_j] = True
        elif iou_crowd is not None and iou_crowd[i].size and iou_crowd[i].max() >= iou_thr:
            det_ignored[i] = True
    return matched, det_ignored


def _average_precision_101(matched: np.ndarray, scores: np.ndarray, n_pos: int) -> float:
    """COCO 101-point interpolated AP from a global match list."""
    if n_pos == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="mergesort")
    tp = matched[order]
    fp = ~tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / n_pos
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
    # precision envelope
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    recall_points = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, recall_points, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, max(len(precision) - 1, 0))], 0.0)
    return float(np.mean(prec_at))


def eval_coco_map(
    detections: List[Dict[str, np.ndarray]],
    annotations: List[Dict[str, np.ndarray]],
    num_classes: int,
    iou_thrs: Optional[Sequence[float]] = None,
    max_dets: int = 100,
    area_range: str = "all",
) -> Dict[str, float]:
    """COCO-style mAP.

    detections[i]: {'boxes': (D,4), 'scores': (D,), 'labels': (D,) 1-based}
    annotations[i]: {'bboxes': (G,4), 'labels': (G,) 1-based,
                     'bboxes_ignore': (R,4)}  (crowd/difficult regions)
    Returns {'mAP', 'mAP_50', 'mAP_75', 'per_class': {...}}.
    """
    if iou_thrs is None:
        iou_thrs = np.arange(0.5, 1.0, 0.05)
    lo, hi = COCO_AREA_RANGES[area_range]

    # ap[t][c]
    aps = np.full((len(iou_thrs), num_classes), np.nan)
    for c in range(1, num_classes + 1):
        per_img = []
        n_pos = 0
        for det, ann in zip(detections, annotations):
            keep = det["labels"] == c
            boxes = det["boxes"][keep]
            scores = det["scores"][keep]
            order = np.argsort(-scores, kind="mergesort")[:max_dets]
            boxes, scores = boxes[order], scores[order]

            gt_keep = ann["labels"] == c
            gts = ann["bboxes"][gt_keep]
            areas = _box_area(gts)
            gt_ignore = (areas < lo) | (areas > hi)
            ignore_regions = ann.get("bboxes_ignore", np.zeros((0, 4)))
            n_pos += int((~gt_ignore).sum())
            per_img.append((boxes, scores, gts, gt_ignore, ignore_regions))

        for t, thr in enumerate(iou_thrs):
            all_scores, all_matched = [], []
            for boxes, scores, gts, gt_ignore, ignore_regions in per_img:
                # drop detections outside the area range only when they are
                # unmatched (COCO treats them as ignored); approximation:
                # filter by det area when evaluating size buckets
                if area_range != "all" and len(boxes):
                    da = _box_area(boxes)
                    sel = (da >= lo) & (da <= hi)
                    boxes_t, scores_t = boxes[sel], scores[sel]
                else:
                    boxes_t, scores_t = boxes, scores
                matched, det_ignored = _match_image(boxes_t, gts, gt_ignore, ignore_regions, thr)
                keep = ~det_ignored
                all_scores.append(scores_t[keep])
                all_matched.append(matched[keep])
            scores_cat = np.concatenate(all_scores) if all_scores else np.zeros(0)
            matched_cat = np.concatenate(all_matched) if all_matched else np.zeros(0, bool)
            aps[t, c - 1] = _average_precision_101(matched_cat, scores_cat, n_pos)

    valid = ~np.isnan(aps)
    mean_ap = float(np.nanmean(aps)) if valid.any() else 0.0
    ap50 = float(np.nanmean(aps[0])) if valid[0].any() else 0.0
    idx75 = int(round((0.75 - 0.5) / 0.05))
    ap75 = float(np.nanmean(aps[idx75])) if idx75 < len(iou_thrs) and valid[idx75].any() else 0.0
    per_class = {c + 1: float(np.nanmean(aps[:, c])) for c in range(num_classes) if valid[:, c].any()}
    return {"mAP": mean_ap, "mAP_50": ap50, "mAP_75": ap75, "per_class": per_class}


def mask_iou_matrix(det_masks: np.ndarray, gt_masks: np.ndarray) -> np.ndarray:
    """IoU between (D, H, W) and (G, H, W) binary masks -> (D, G)."""
    if len(det_masks) == 0 or len(gt_masks) == 0:
        return np.zeros((len(det_masks), len(gt_masks)))
    d = np.asarray(det_masks, bool).reshape(len(det_masks), -1)
    g = np.asarray(gt_masks, bool).reshape(len(gt_masks), -1)
    inter = d.astype(np.float64) @ g.astype(np.float64).T
    area_d = d.sum(axis=1)[:, None]
    area_g = g.sum(axis=1)[None, :]
    return inter / np.maximum(area_d + area_g - inter, 1e-9)


def eval_coco_segm_map(
    detections: List[Dict[str, np.ndarray]],
    annotations: List[Dict[str, np.ndarray]],
    num_classes: int,
    iou_thrs: Optional[Sequence[float]] = None,
    max_dets: int = 100,
) -> Dict[str, float]:
    """COCO-style segmentation mAP (matching by mask IoU).

    detections[i] additionally carries ``masks`` (D, H, W) bool;
    annotations[i] carries ``masks`` (list of (H, W) uint8, aligned with
    ``labels``).  Same protocol as ``eval_coco_map`` otherwise.
    """
    if iou_thrs is None:
        iou_thrs = np.arange(0.5, 1.0, 0.05)

    aps = np.full((len(iou_thrs), num_classes), np.nan)
    for c in range(1, num_classes + 1):
        per_img = []
        n_pos = 0
        for det, ann in zip(detections, annotations):
            keep = det["labels"] == c
            scores = det["scores"][keep]
            masks = np.asarray(det["masks"])[keep]
            order = np.argsort(-scores, kind="mergesort")[:max_dets]
            scores, masks = scores[order], masks[order]

            gt_keep = np.asarray(ann["labels"]) == c
            gt_masks = [m for m, k in zip(ann["masks"], gt_keep) if k]
            gt_masks = np.asarray(gt_masks) if gt_masks else np.zeros((0, 1, 1))
            n_pos += len(gt_masks)
            miou = mask_iou_matrix(masks, gt_masks) if len(masks) and len(gt_masks) else np.zeros((len(masks), len(gt_masks)))
            per_img.append((scores, miou, len(gt_masks)))

        for t, thr in enumerate(iou_thrs):
            all_scores, all_matched = [], []
            for scores, miou, g in per_img:
                matched, det_ignored = _match_image(
                    np.zeros((len(scores), 4)), np.zeros((g, 4)),
                    np.zeros(g, bool), np.zeros((0, 4)), thr, iou=miou,
                )
                keep = ~det_ignored
                all_scores.append(scores[keep])
                all_matched.append(matched[keep])
            scores_cat = np.concatenate(all_scores) if all_scores else np.zeros(0)
            matched_cat = np.concatenate(all_matched) if all_matched else np.zeros(0, bool)
            aps[t, c - 1] = _average_precision_101(matched_cat, scores_cat, n_pos)

    valid = ~np.isnan(aps)
    mean_ap = float(np.nanmean(aps)) if valid.any() else 0.0
    ap50 = float(np.nanmean(aps[0])) if valid[0].any() else 0.0
    return {"mAP": mean_ap, "mAP_50": ap50}


def eval_voc_map(
    detections: List[Dict[str, np.ndarray]],
    annotations: List[Dict[str, np.ndarray]],
    num_classes: int,
    iou_thr: float = 0.5,
    use_07_metric: bool = False,
) -> Dict[str, float]:
    """VOC AP@0.5 (11-point for VOC2007, all-point otherwise)."""
    aps = {}
    for c in range(1, num_classes + 1):
        all_scores, all_matched = [], []
        n_pos = 0
        for det, ann in zip(detections, annotations):
            keep = det["labels"] == c
            boxes = det["boxes"][keep]
            scores = det["scores"][keep]
            order = np.argsort(-scores, kind="mergesort")
            boxes, scores = boxes[order], scores[order]
            gt_keep = ann["labels"] == c
            gts = ann["bboxes"][gt_keep]
            ignore_regions = ann.get("bboxes_ignore", np.zeros((0, 4)))
            n_pos += len(gts)
            matched, det_ignored = _match_image(
                boxes, gts, np.zeros(len(gts), bool), ignore_regions, iou_thr
            )
            keep2 = ~det_ignored
            all_scores.append(scores[keep2])
            all_matched.append(matched[keep2])
        scores_cat = np.concatenate(all_scores) if all_scores else np.zeros(0)
        matched_cat = np.concatenate(all_matched) if all_matched else np.zeros(0, bool)
        if n_pos == 0:
            continue
        order = np.argsort(-scores_cat, kind="mergesort")
        tp = matched_cat[order]
        tp_cum = np.cumsum(tp)
        fp_cum = np.cumsum(~tp)
        recall = tp_cum / n_pos
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
        if use_07_metric:
            ap = 0.0
            for r in np.arange(0.0, 1.1, 0.1):
                p = precision[recall >= r].max() if (recall >= r).any() else 0.0
                ap += p / 11.0
        else:
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            idx = np.where(recall[1:] != recall[:-1])[0]
            ap = float(np.sum((recall[idx + 1] - recall[idx]) * precision[idx + 1])) if len(recall) else 0.0
            if len(recall) and recall[0] > 0:
                ap += recall[0] * precision[0]
        aps[c] = float(ap)
    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    return {"mAP": mean_ap, "per_class": aps}


def detections_from_nms(nms_result, valid_only: bool = True) -> List[Dict[str, np.ndarray]]:
    """Convert a batched NMSResult (labels 0-based) into per-image detection
    dicts with 1-based labels for the evaluators."""
    boxes = np.asarray(nms_result.boxes)
    scores = np.asarray(nms_result.scores)
    labels = np.asarray(nms_result.labels)
    valid = np.asarray(nms_result.valid)
    out = []
    for i in range(boxes.shape[0]):
        v = valid[i] if valid_only else np.ones(boxes.shape[1], bool)
        out.append(
            dict(boxes=boxes[i][v], scores=scores[i][v], labels=labels[i][v] + 1)
        )
    return out
