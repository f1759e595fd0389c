"""Synthetic dataset fixtures: tiny COCO json + images, tiny VOC tree."""

import json
import os
import os.path as osp

import cv2
import numpy as np


def make_images(img_dir, specs):
    """specs: list of (filename, h, w). Writes random uint8 jpgs."""
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    for name, h, w in specs:
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        assert cv2.imwrite(osp.join(img_dir, name), img)


def make_coco(root, with_mask=True):
    """3 images: one landscape w/ 2 anns (1 crowd), one portrait w/ 1 ann,
    one image with no annotations (must be filtered in train mode)."""
    img_dir = osp.join(root, "images")
    specs = [("a.jpg", 60, 100), ("b.jpg", 100, 60), ("c.jpg", 80, 80)]
    make_images(img_dir, specs)

    images = [
        {"id": 1, "file_name": "a.jpg", "height": 60, "width": 100},
        {"id": 2, "file_name": "b.jpg", "height": 100, "width": 60},
        {"id": 3, "file_name": "c.jpg", "height": 80, "width": 80},
    ]
    categories = [
        {"id": 11, "name": "cat"},
        {"id": 13, "name": "dog"},
    ]
    annotations = [
        {
            "id": 1, "image_id": 1, "category_id": 11, "iscrowd": 0,
            "bbox": [10, 10, 30, 20], "area": 600,
            "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]],
        },
        {
            "id": 2, "image_id": 1, "category_id": 13, "iscrowd": 1,
            "bbox": [50, 20, 20, 20], "area": 400,
            "segmentation": {"size": [60, 100], "counts": [0, 60 * 100]},
        },
        {
            "id": 3, "image_id": 2, "category_id": 13, "iscrowd": 0,
            "bbox": [5, 40, 20, 30], "area": 600,
            "segmentation": [[5, 40, 25, 40, 25, 70, 5, 70]],
        },
    ]
    if not with_mask:
        for a in annotations:
            a.pop("segmentation", None)
    ann_file = osp.join(root, "ann.json")
    with open(ann_file, "w") as f:
        json.dump(
            {"images": images, "annotations": annotations, "categories": categories}, f
        )
    return ann_file, img_dir


VOC_XML = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""

VOC_OBJ = """<object>
  <name>{cls}</name>
  <difficult>{difficult}</difficult>
  <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
</object>
"""


def make_voc(root, year="voc2007"):
    """2 trainval images (1 difficult obj), 1 test image."""
    base = osp.join(root, year)
    os.makedirs(osp.join(base, "Annotations"), exist_ok=True)
    os.makedirs(osp.join(base, "ImageSets/Main"), exist_ok=True)
    img_dir = osp.join(base, "JPEGImages")
    make_images(img_dir, [("t0.jpg", 50, 80), ("t1.jpg", 80, 50), ("te0.jpg", 64, 64)])

    def write_xml(name, w, h, objs):
        objects = "".join(
            VOC_OBJ.format(cls=c, difficult=d, x1=x1, y1=y1, x2=x2, y2=y2)
            for c, d, x1, y1, x2, y2 in objs
        )
        with open(osp.join(base, "Annotations", name + ".xml"), "w") as f:
            f.write(VOC_XML.format(name=name, w=w, h=h, objects=objects))

    write_xml("t0", 80, 50, [("dog", 0, 10, 10, 40, 35), ("cat", 1, 5, 5, 20, 20)])
    write_xml("t1", 50, 80, [("person", 0, 8, 20, 30, 60)])
    write_xml("te0", 64, 64, [("car", 0, 4, 4, 40, 40)])

    with open(osp.join(base, "ImageSets/Main/trainval.txt"), "w") as f:
        f.write("t0\nt1\n")
    with open(osp.join(base, "ImageSets/Main/test.txt"), "w") as f:
        f.write("te0\n")
    return base


def make_golden_coco(root, n_images=8, size=64, seed=7):
    """Learnable synthetic detection set for the golden-mAP harness: each
    image holds 1-2 axis-aligned bright squares on a dark noisy background;
    class 1 ("red") lights channel 0, class 2 ("green") channel 1.  A tiny
    detector trained for a few dozen steps must reach high mAP — a banded
    assert on that mAP is the end-to-end quality regression the ≤0.1-mAP
    north star gate can have on a dataset-less box."""
    img_dir = osp.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        img = rng.integers(0, 40, (size, size, 3), np.uint8)
        n_obj = 1 + (i % 2)
        for _ in range(n_obj):
            s = int(rng.integers(16, 28))
            x = int(rng.integers(2, size - s - 2))
            y = int(rng.integers(2, size - s - 2))
            cls = int(rng.integers(1, 3))  # 1 or 2
            img[y : y + s, x : x + s, cls - 1] = 220
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cls,
                "iscrowd": 0, "bbox": [x, y, s, s], "area": s * s,
                "segmentation": [[x, y, x + s, y, x + s, y + s, x, y + s]],
            })
            ann_id += 1
        name = f"g{i}.png"  # png: lossless, keeps the square edges crisp
        assert cv2.imwrite(osp.join(img_dir, name), img)
        images.append({"id": i + 1, "file_name": name, "height": size, "width": size})
    categories = [{"id": 1, "name": "red"}, {"id": 2, "name": "green"}]
    ann_file = osp.join(root, "golden.json")
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, f)
    return ann_file, img_dir
