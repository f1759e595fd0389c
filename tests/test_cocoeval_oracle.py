"""Protocol cross-check: eval_coco_map / eval_coco_segm_map vs an
independent, line-faithful port of the pycocotools COCOeval algorithm
(tests/cocoeval_oracle.py).

pycocotools itself is unavailable here (the reference imports it at
/root/reference/datasets/utils/mask.py:9); the production evaluator is a
from-scratch reimplementation, so protocol drift (score-tie ordering,
recall-threshold indexing, crowd absorption, area-range ignoring) would
otherwise pass silently while making every reported mAP subtly wrong.
These property tests compare the full 12-metric suite on randomized scenes
to < 1e-9.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.core

from cocoeval_oracle import COCOevalOracle
from torch_detection_tpu.engine.eval import eval_coco_map, eval_coco_segm_map

KEYS = [
    "mAP", "mAP_50", "mAP_75", "mAP_s", "mAP_m", "mAP_l",
    "AR_1", "AR_10", "AR_100", "AR_s", "AR_m", "AR_l",
]


def _rand_boxes(rng, n, canvas=400.0):
    """xyxy (inclusive +1) with log-uniform sizes so every COCO area bucket
    (<32^2, 32^2..96^2, >96^2) gets populated."""
    x1 = rng.uniform(0, canvas * 0.8, n)
    y1 = rng.uniform(0, canvas * 0.8, n)
    wh = np.exp(rng.uniform(np.log(2.0), np.log(150.0), (n, 2)))
    return np.stack([x1, y1, x1 + wh[:, 0], y1 + wh[:, 1]], axis=1)


def _random_scene(rng, num_classes=3, n_images=4, big=False):
    dets, anns = [], []
    for _ in range(n_images):
        G = int(rng.integers(0, 7))
        gt_boxes = _rand_boxes(rng, G)
        gt_labels = rng.integers(1, num_classes + 1, G)
        R = int(rng.integers(0, 3))
        crowd_boxes = _rand_boxes(rng, R)
        crowd_labels = rng.integers(1, num_classes + 1, R)
        ann = dict(
            bboxes=gt_boxes.astype(np.float32),
            labels=gt_labels.astype(np.int64),
            bboxes_ignore=crowd_boxes.astype(np.float32),
        )
        if rng.random() < 0.7:
            ann["labels_ignore"] = crowd_labels.astype(np.int64)
        if rng.random() < 0.5:
            # COCO uses segmentation areas, not box areas — exercise the path
            ann["areas"] = (
                (gt_boxes[:, 2] - gt_boxes[:, 0] + 1)
                * (gt_boxes[:, 3] - gt_boxes[:, 1] + 1)
                * rng.uniform(0.5, 1.2, G)
            )

        # detections: jittered gt copies (some duplicated) + pure noise
        n_noise = int(rng.integers(0, 5)) + (120 if big else 0)
        parts, labels = [], []
        for j in range(G):
            for _ in range(int(rng.integers(0, 3))):
                jitter = rng.normal(0, rng.uniform(0.5, 12.0), 4)
                parts.append(gt_boxes[j] + jitter)
                labels.append(gt_labels[j] if rng.random() < 0.8
                              else int(rng.integers(1, num_classes + 1)))
        noise = _rand_boxes(rng, n_noise)
        boxes = np.concatenate([parts, noise]) if parts else noise
        labels = np.asarray(
            labels + list(rng.integers(1, num_classes + 1, n_noise)), np.int64
        )
        # quantized scores force ties — the ordering-sensitivity probe
        scores = rng.integers(0, 5, len(boxes)).astype(np.float32) / 4.0
        dets.append(dict(
            boxes=boxes.astype(np.float32), scores=scores, labels=labels,
        ))
        anns.append(ann)
    return dets, anns


def test_box_protocol_matches_cocoeval_oracle():
    rng = np.random.default_rng(7)
    worst = 0.0
    for scene in range(100):
        num_classes = int(rng.integers(1, 4))
        dets, anns = _random_scene(
            rng, num_classes=num_classes,
            n_images=int(rng.integers(1, 5)),
            big=(scene % 25 == 0),  # >100 dets: exercises top-k truncation
        )
        ours = eval_coco_map(dets, anns, num_classes)
        ref = COCOevalOracle(dets, anns, num_classes).accumulate().summarize()
        for k in KEYS:
            worst = max(worst, abs(ours[k] - ref[k]))
            assert ours[k] == pytest.approx(ref[k], abs=1e-9), (scene, k)
    assert worst < 1e-9


def _boxes_to_masks(boxes, h, w, rng):
    """Irregular masks inside each box (so mask IoU != box IoU)."""
    out = []
    for b in boxes:
        m = np.zeros((h, w), np.uint8)
        x1, y1 = int(max(b[0], 0)), int(max(b[1], 0))
        x2, y2 = int(min(b[2] + 1, w)), int(min(b[3] + 1, h))
        if x2 > x1 and y2 > y1:
            m[y1:y2, x1:x2] = (rng.random((y2 - y1, x2 - x1)) < 0.8).astype(np.uint8)
        out.append(m)
    return out


def test_segm_protocol_matches_cocoeval_oracle():
    rng = np.random.default_rng(11)
    h, w = 70, 64
    for scene in range(25):
        num_classes = int(rng.integers(1, 4))
        dets, anns = _random_scene(
            rng, num_classes=num_classes, n_images=int(rng.integers(1, 4))
        )
        for det, ann in zip(dets, anns):
            det["boxes"] = np.clip(det["boxes"] * 0.15, 0, [w - 1, h - 1, w - 1, h - 1])
            ann["bboxes"] = np.clip(ann["bboxes"] * 0.15, 0, [w - 1, h - 1, w - 1, h - 1])
            ann["bboxes_ignore"] = np.clip(
                ann["bboxes_ignore"] * 0.15, 0, [w - 1, h - 1, w - 1, h - 1]
            )
            det["masks"] = _boxes_to_masks(det["boxes"], h, w, rng)
            ann["masks"] = _boxes_to_masks(ann["bboxes"], h, w, rng)
            ann["masks_ignore"] = _boxes_to_masks(ann["bboxes_ignore"], h, w, rng)
            ann.pop("areas", None)  # segm areas are mask pixel counts
        ours = eval_coco_segm_map(dets, anns, num_classes)
        ref = (
            COCOevalOracle(dets, anns, num_classes, iou_type="segm")
            .accumulate()
            .summarize()
        )
        for k in KEYS:
            assert ours[k] == pytest.approx(ref[k], abs=1e-9), (scene, k)
