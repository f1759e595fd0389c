"""VOCDataset: Pascal VOC XML annotations with pkl caching.

Parity surface: reference ``datasets/voc.py`` (TCGGroup/Torch_Detection):
20-class table (``voc.py:93-97``), 1-based -> 0-based pixel coords
(``:184-187``), difficult -> ignore (``:189-191``), voc07/voc12/voc07+12
scopes with pkl caching (``:102-147``).

Fixed (SURVEY.md appendix): the reference's voc07+12 *train* split wrongly
included VOC2007 *test* images (``voc.py:138-141``); here train = trainval07
+ trainval12, the standard 07+12 protocol.
"""

from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET
from typing import Dict, List

import numpy as np

from ..utils.file_handler import dump
from ..utils.misc import exist_or_mkdir, file_is_exist
from ..utils.registry import DATASETS
from .base import BaseDataset

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


@DATASETS.register_module
class VOCDataset(BaseDataset):
    def __init__(
        self,
        cache_dir: str = "data/cache/",
        dataset_scope: str = "voc07",
        dataset_root: str = "data/voc/voc2007/",
        img_expected_sizes=(1000, 600),
        test_mode: bool = False,
        **kwargs,
    ):
        assert dataset_scope in ("voc07", "voc12", "voc07+12")
        ann_file, img_prefix = self._parse_voc(cache_dir, dataset_scope, dataset_root, test_mode)
        super().__init__(
            ann_file=ann_file,
            img_prefix=img_prefix,
            img_expected_sizes=img_expected_sizes,
            test_mode=test_mode,
            **kwargs,
        )

    # ------------------------------------------------------------- parsing
    def _parse_voc(self, cache_dir, dataset_scope, dataset_root, test_mode):
        self.classes = VOC_CLASSES
        class_to_cat = {cls: i + 1 for i, cls in enumerate(self.classes)}
        split = "test" if test_mode else "train"
        cache_file = osp.join(cache_dir, f"{dataset_scope}_{split}.pkl")
        exist_or_mkdir(cache_dir)

        if dataset_scope in ("voc07", "voc12"):
            img_prefix = osp.join(dataset_root, "JPEGImages/")
            if not file_is_exist(cache_file):
                infos = self._parse_voc_single(dataset_root, class_to_cat, test_mode)
                dump(infos, cache_file)
            return cache_file, img_prefix

        # voc07+12: train = trainval07 + trainval12; test = VOC2007 test
        # (the standard protocol; VOC2012 test has no public annotations)
        img_prefix = dataset_root
        if not file_is_exist(cache_file):
            root07 = osp.join(dataset_root, "VOC2007/")
            root12 = osp.join(dataset_root, "VOC2012/")
            if test_mode:
                infos = self._parse_voc_single(
                    root07, class_to_cat, test_mode=True, name_prefix="VOC2007/JPEGImages/"
                )
            else:
                infos = self._parse_voc_single(
                    root07, class_to_cat, test_mode=False, name_prefix="VOC2007/JPEGImages/"
                ) + self._parse_voc_single(
                    root12, class_to_cat, test_mode=False, name_prefix="VOC2012/JPEGImages/"
                )
            dump(infos, cache_file)
        return cache_file, img_prefix

    def _parse_voc_single(self, dataset_root, class_to_cat, test_mode, name_prefix="") -> List[Dict]:
        ann_prefix = osp.join(dataset_root, "Annotations/")
        listfile = osp.join(
            dataset_root, "ImageSets/Main", "test.txt" if test_mode else "trainval.txt"
        )
        with open(listfile) as f:
            names = [line.strip() for line in f if line.strip()]
        return [
            self._parse_ann_info(osp.join(ann_prefix, name + ".xml"), class_to_cat, name_prefix)
            for name in names
        ]

    def _parse_ann_info(self, annotation_file, class_to_cat, name_prefix) -> Dict:
        tree = ET.parse(annotation_file)
        filename = name_prefix + tree.find("filename").text.strip()
        size = tree.find("size")
        width = int(size.find("width").text)
        height = int(size.find("height").text)

        bboxes, labels, bboxes_ignore = [], [], []
        for obj in tree.findall("object"):
            bnd = obj.find("bndbox")
            # VOC pixel indices are 1-based
            box = [
                float(bnd.find("xmin").text) - 1,
                float(bnd.find("ymin").text) - 1,
                float(bnd.find("xmax").text) - 1,
                float(bnd.find("ymax").text) - 1,
            ]
            difficult = obj.find("difficult")
            if difficult is not None and int(difficult.text) == 1:
                bboxes_ignore.append(box)
            else:
                cls_name = obj.find("name").text.lower().strip()
                bboxes.append(box)
                labels.append(class_to_cat[cls_name])
        return dict(
            filename=filename,
            width=width,
            height=height,
            ann=dict(
                bboxes=np.asarray(bboxes, np.float32).reshape(-1, 4),
                labels=np.asarray(labels, np.int64),
                bboxes_ignore=np.asarray(bboxes_ignore, np.float32).reshape(-1, 4),
            ),
        )
