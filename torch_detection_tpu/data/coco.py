"""CocoDataset.

Parity surface: reference ``datasets/coco.py`` (TCGGroup/Torch_Detection):
cat_id -> contiguous 1-based label map (``coco.py:14-17``), sorted image ids
(``:21``), filter of images without annotations (``:29-38``), and the
bbox/label/ignore (+ optional mask/poly) ann dict (``:40-88``).  Backed by
the native COCO index (``data/coco_api.py``) instead of pycocotools.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..utils.registry import DATASETS
from .base import BaseDataset
from .coco_api import COCO
from .ops.bbox import bbox_parse
from .ops.mask import mask_parse, segm_to_mask


@DATASETS.register_module
class CocoDataset(BaseDataset):
    def load_annotations(self, ann_file) -> List[Dict]:
        self.coco = COCO(ann_file)
        cat_ids = self.coco.get_cat_ids()
        self.classes = [self.coco.load_cats([cid])[0]["name"] for cid in cat_ids]
        self.cat2label = {cid: i + 1 for i, cid in enumerate(cat_ids)}
        self.img_ids = sorted(self.coco.get_img_ids())
        img_infos = []
        for img_id in self.img_ids:
            info = dict(self.coco.load_imgs([img_id])[0])
            info["filename"] = info["file_name"]
            img_infos.append(info)
        return img_infos

    def _filter_imgs(self, min_size: int = 32) -> List[int]:
        """Drop images that are too small or carry no annotations."""
        ids_with_ann = {a["image_id"] for a in self.coco.anns.values()}
        return [
            i
            for i, info in enumerate(self.img_infos)
            if info["id"] in ids_with_ann and min(info["width"], info["height"]) >= min_size
        ]

    def get_ann_info(self, idx: int) -> Dict:
        img_info = self.img_infos[idx]
        anns = self.coco.load_anns(self.coco.get_ann_ids(img_ids=[img_info["id"]]))

        gt_bboxes: List = []
        gt_labels: List = []
        gt_bboxes_ignore: List = []
        gt_labels_ignore: List = []
        gt_areas: List = []
        gt_masks: List = []
        gt_masks_ignore: List = []
        gt_mask_polys: List = []
        gt_poly_lens: List = []

        for ann in anns:
            if not bbox_parse(
                ann, gt_bboxes, gt_labels, gt_bboxes_ignore, self.cat2label,
                gt_labels_ignore=gt_labels_ignore, gt_areas=gt_areas,
            ):
                continue
            if self.with_mask and not ann.get("iscrowd", 0):
                mask_parse(
                    ann, gt_masks, gt_mask_polys, gt_poly_lens,
                    img_info["height"], img_info["width"],
                )
            elif self.with_mask:
                # crowd region: segm evaluator ignores detections covering it
                # (intersection / det-area IoU), mirroring bboxes_ignore;
                # stays zip-aligned with labels_ignore (zeros if no segm)
                if "segmentation" in ann:
                    gt_masks_ignore.append(segm_to_mask(
                        ann["segmentation"], img_info["height"], img_info["width"],
                    ))
                else:
                    # no segm on the crowd ann: rasterize its bbox window so
                    # segm eval ignores detections there exactly like box
                    # eval does via bboxes_ignore (an all-zero mask would
                    # instead score them as false positives)
                    m = np.zeros((img_info["height"], img_info["width"]), np.uint8)
                    x, y, w, h = (float(v) for v in ann["bbox"])
                    x1, y1 = int(np.floor(x)), int(np.floor(y))
                    x2, y2 = int(np.ceil(x + w)), int(np.ceil(y + h))
                    m[max(y1, 0): max(y2, 0), max(x1, 0): max(x2, 0)] = 1
                    gt_masks_ignore.append(m)

        out = dict(
            bboxes=np.asarray(gt_bboxes, np.float32).reshape(-1, 4),
            labels=np.asarray(gt_labels, np.int64),
            bboxes_ignore=np.asarray(gt_bboxes_ignore, np.float32).reshape(-1, 4),
            labels_ignore=np.asarray(gt_labels_ignore, np.int64),
            areas=np.asarray(gt_areas, np.float64),
        )
        if self.with_mask:
            out["masks"] = gt_masks
            out["masks_ignore"] = gt_masks_ignore
            out["mask_polys"] = gt_mask_polys
            out["poly_lens"] = gt_poly_lens
        return out
