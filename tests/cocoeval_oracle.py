"""Test-only, line-faithful numpy port of the pycocotools COCOeval protocol.

pycocotools is not available in this environment (the reference imports it at
/root/reference/datasets/utils/mask.py:9 and coco.py:1-17); the framework's
evaluator (torch_detection_tpu/engine/eval.py) re-implements the protocol
from scratch.  This module is an INDEPENDENT second implementation, written
to mirror the published COCOeval.evaluateImg / accumulate / summarize
algorithm statement-for-statement (same variable roles, same loop order,
same tie-breaking), so property tests can verify the production evaluator
never drifts from the canonical protocol (score-tie ordering,
recall-threshold indexing, crowd absorption, area-range ignoring, ...).

Structured exactly like COCOeval:
  * per (category, image): dts sorted by -score (stable), gts sorted
    ignored-last (stable), greedy threshold-by-threshold matching where a
    det takes the highest-IoU free gt, crowds stay reusable, and a
    non-ignored candidate blocks later ignored gts;
  * accumulate: concatenate per-image results in image order, stable-sort by
    -score, cumulate tp/fp excluding ignored dets, precision envelope,
    searchsorted(recThrs, side='left');
  * summarize: mean over precision[precision > -1].

Box inputs here are xyxy in this framework's inclusive +1 convention; they
convert to COCO [x, y, w, h] with w = x2 - x1 + 1, which makes the COCO
continuous-box IoU equal the framework's offset-1 IoU identically.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def _coco_box_iou(dt_xywh: np.ndarray, gt_xywh: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """maskUtils.iou for boxes: continuous [x,y,w,h] overlap; crowd columns
    divide by the detection area only."""
    D, G = len(dt_xywh), len(gt_xywh)
    iou = np.zeros((D, G))
    for g in range(G):
        gx, gy, gw, gh = gt_xywh[g]
        ga = gw * gh
        for d in range(D):
            dx, dy, dw, dh = dt_xywh[d]
            da = dw * dh
            w = min(dx + dw, gx + gw) - max(dx, gx)
            h = min(dy + dh, gy + gh) - max(dy, gy)
            if w <= 0 or h <= 0:
                continue
            i = w * h
            u = da if iscrowd[g] else da + ga - i
            iou[d, g] = i / u
    return iou


def _mask_iou(dt_masks, gt_masks, iscrowd) -> np.ndarray:
    D, G = len(dt_masks), len(gt_masks)
    iou = np.zeros((D, G))
    for g in range(G):
        gm = np.asarray(gt_masks[g], bool).ravel()
        ga = gm.sum()
        for d in range(D):
            dm = np.asarray(dt_masks[d], bool).ravel()
            da = dm.sum()
            i = float(np.logical_and(dm, gm).sum())
            u = float(da) if iscrowd[g] else float(da + ga - i)
            iou[d, g] = i / u if u > 0 else 0.0
    return iou


class COCOevalOracle:
    """Faithful COCOeval over in-memory detections/annotations.

    detections[i]: {'boxes' (D,4) xyxy(+1), 'scores' (D,), 'labels' (D,)
                    1-based, optional 'masks'}
    annotations[i]: {'bboxes', 'labels', 'bboxes_ignore', optional
                    'labels_ignore', optional 'areas', optional 'masks' /
                    'masks_ignore'} — the same contract eval_coco_map takes.
    """

    def __init__(
        self,
        detections: List[Dict],
        annotations: List[Dict],
        num_classes: int,
        iou_type: str = "bbox",
        max_dets: Sequence[int] = (1, 10, 100),
    ):
        self.iouThrs = np.linspace(0.5, 0.95, 10)
        self.recThrs = np.linspace(0.0, 1.0, 101)
        self.maxDets = sorted(max_dets)
        self.areaRng = [[0.0, 1e10], [0.0, 32.0**2], [32.0**2, 96.0**2], [96.0**2, 1e10]]
        self.areaRngLbl = ["all", "small", "medium", "large"]
        self.catIds = list(range(1, num_classes + 1))
        self.imgIds = list(range(len(detections)))
        self.iou_type = iou_type

        # build COCO-style per-(img, cat) gt/dt record lists
        self._gts: Dict = {}
        self._dts: Dict = {}
        uid = [1]

        def xyxy_to_xywh(b):
            b = np.asarray(b, np.float64).reshape(-1, 4)
            return np.stack(
                [b[:, 0], b[:, 1], b[:, 2] - b[:, 0] + 1.0, b[:, 3] - b[:, 1] + 1.0], axis=1
            )

        for i, ann in enumerate(annotations):
            for c in self.catIds:
                self._gts[i, c] = []
                self._dts[i, c] = []
            labels = np.asarray(ann["labels"])
            boxes = xyxy_to_xywh(ann["bboxes"]) if len(ann["labels"]) else np.zeros((0, 4))
            areas = ann.get("areas")
            masks = ann.get("masks")
            for j in range(len(labels)):
                area = float(areas[j]) if areas is not None else float(boxes[j, 2] * boxes[j, 3])
                g = dict(id=uid[0], area=area, iscrowd=0, ignore=0, bbox=boxes[j])
                if masks is not None:
                    g["mask"] = masks[j]
                self._gts[i, int(labels[j])].append(g)
                uid[0] += 1
            ig_boxes = np.asarray(ann.get("bboxes_ignore", np.zeros((0, 4)))).reshape(-1, 4)
            ig_labels = ann.get("labels_ignore")
            ig_masks = ann.get("masks_ignore")
            ig_xywh = xyxy_to_xywh(ig_boxes) if len(ig_boxes) else np.zeros((0, 4))
            for j in range(len(ig_boxes)):
                cats = [int(ig_labels[j])] if ig_labels is not None else self.catIds
                for c in cats:
                    area = float(ig_xywh[j, 2] * ig_xywh[j, 3])
                    g = dict(id=uid[0], area=area, iscrowd=1, ignore=1,
                             bbox=ig_xywh[j])
                    if ig_masks is not None:
                        g["mask"] = ig_masks[j]
                        if self.iou_type == "segm":
                            g["area"] = float(np.asarray(ig_masks[j], bool).sum())
                    self._gts[i, c].append(g)
                    uid[0] += 1

        for i, det in enumerate(detections):
            labels = np.asarray(det["labels"])
            boxes = xyxy_to_xywh(det["boxes"]) if len(labels) else np.zeros((0, 4))
            scores = np.asarray(det["scores"], np.float64)
            masks = det.get("masks")
            for j in range(len(labels)):
                d = dict(id=uid[0], score=float(scores[j]), bbox=boxes[j],
                         area=float(boxes[j, 2] * boxes[j, 3]))
                if masks is not None:
                    d["mask"] = masks[j]
                    if self.iou_type == "segm":
                        d["area"] = float(np.asarray(masks[j], bool).sum())
                self._dts[i, int(labels[j])].append(d)
                uid[0] += 1

        if self.iou_type == "segm":
            for recs in list(self._gts.values()):
                for g in recs:
                    g["area"] = float(np.asarray(g["mask"], bool).sum()) if "mask" in g else g["area"]

    # ---- COCOeval.computeIoU
    def _compute_iou(self, img, cat) -> np.ndarray:
        gt = self._gts[img, cat]
        dt = self._dts[img, cat]
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > self.maxDets[-1]:
            dt = dt[: self.maxDets[-1]]
        iscrowd = np.array([int(g["iscrowd"]) for g in gt])
        if self.iou_type == "segm":
            return _mask_iou([d["mask"] for d in dt], [g["mask"] for g in gt], iscrowd)
        return _coco_box_iou(
            np.stack([d["bbox"] for d in dt]), np.stack([g["bbox"] for g in gt]), iscrowd
        )

    # ---- COCOeval.evaluateImg
    def _evaluate_img(self, img, cat, aRng, maxDet, ious):
        gt = self._gts[img, cat]
        dt = self._dts[img, cat]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < aRng[0] or g["area"] > aRng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:maxDet]]
        iscrowd = [int(g["iscrowd"]) for g in gt]
        ious = ious[:, gtind] if len(ious) > 0 else ious

        T = len(self.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious) != 0:
            for tind, t in enumerate(self.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array(
            [d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]
        ).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    # ---- COCOeval.evaluate + accumulate
    def accumulate(self):
        T = len(self.iouThrs)
        R = len(self.recThrs)
        K = len(self.catIds)
        A = len(self.areaRng)
        M = len(self.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        ious = {
            (img, cat): self._compute_iou(img, cat)
            for img in self.imgIds
            for cat in self.catIds
        }
        maxDet = self.maxDets[-1]
        evalImgs = {
            (k, a, i): self._evaluate_img(i, cat, self.areaRng[a], maxDet, ious[i, cat])
            for k, cat in enumerate(self.catIds)
            for a in range(A)
            for i in self.imgIds
        }

        for k in range(K):
            for a in range(A):
                for m, md in enumerate(self.maxDets):
                    E = [evalImgs[k, a, i] for i in self.imgIds]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate(
                        [np.asarray(e["dtScores"])[0:md] for e in E]
                    )
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:md] for e in E], axis=1
                    )[:, inds]
                    dtIg = np.concatenate(
                        [e["dtIgnore"][:, 0:md] for e in E], axis=1
                    )[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, self.recThrs, side="left")
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        self.precision = precision
        self.recall = recall
        return self

    # ---- COCOeval.summarize (the 12-metric suite, keyed like eval_coco_map)
    def summarize(self) -> Dict[str, float]:
        def _s(ap=1, iouThr=None, areaRng="all", maxDets=100):
            aind = [self.areaRngLbl.index(areaRng)]
            mind = [self.maxDets.index(maxDets)]
            if ap == 1:
                s = self.precision
                if iouThr is not None:
                    t = np.where(np.isclose(self.iouThrs, iouThr))[0]
                    s = s[t]
                s = s[:, :, :, aind, mind]
            else:
                s = self.recall
                if iouThr is not None:
                    t = np.where(np.isclose(self.iouThrs, iouThr))[0]
                    s = s[t]
                s = s[:, :, aind, mind]
            if len(s[s > -1]) == 0:
                return -1.0
            return float(np.mean(s[s > -1]))

        out = {
            "mAP": _s(1),
            "mAP_50": _s(1, iouThr=0.5),
            "mAP_75": _s(1, iouThr=0.75),
            "mAP_s": _s(1, areaRng="small"),
            "mAP_m": _s(1, areaRng="medium"),
            "mAP_l": _s(1, areaRng="large"),
            "AR_1": _s(0, maxDets=1),
            "AR_10": _s(0, maxDets=10),
            "AR_100": _s(0, maxDets=100),
            "AR_s": _s(0, areaRng="small"),
            "AR_m": _s(0, areaRng="medium"),
            "AR_l": _s(0, areaRng="large"),
        }
        # match eval_coco_map's reporting convention: absent -> 0.0
        return {k: (0.0 if v == -1.0 else v) for k, v in out.items()}
