#!/usr/bin/env python
"""Evaluate a detector checkpoint: run inference over the val set, compute
COCO/VOC mAP.

Usage: python tools/test.py configs/retinanet_r50_fpn_coco.py CKPT
       [--tta] [--max-images N]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description="evaluate a detector")
    parser.add_argument("config")
    parser.add_argument("checkpoint", help="orbax dir or torch://path.pth")
    parser.add_argument("--tta", action="store_true", help="multi-scale x flip fusion")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--voc-metric", action="store_true", help="VOC AP@0.5 instead of COCO mAP")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")

    import jax
    import jax.numpy as jnp

    from torch_detection_tpu.builder import build_detection_cfg, build_detector
    from torch_detection_tpu.data import get_datasets
    from torch_detection_tpu.data.collate import pick_canvas
    from torch_detection_tpu.engine import (
        eval_coco_map,
        eval_voc_map,
        load_checkpoint,
        merge_tta_detections,
    )
    from torch_detection_tpu.models.detectors import (
        FasterRCNNConfig,
        TwoStageDetector,
        decode_detections,
        faster_rcnn_inference,
    )
    from torch_detection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    runtime = cfg.get("runtime", {})
    model = build_detector(cfg["model"], runtime.get("compute_dtype"))
    det_cfg = build_detection_cfg(cfg["detection"])

    val_cfg = dict(cfg["data"]["val"])
    if not args.tta:
        # single-scale eval: use only the first expected size
        sizes = val_cfg.get("img_expected_sizes")
        if isinstance(sizes, list):
            val_cfg["img_expected_sizes"] = sizes[0]
        val_cfg["flip_ratio"] = 0
    dataset = get_datasets(val_cfg)

    canvas = tuple(cfg["data"].get("canvas") or (800, 1344))
    x = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    if isinstance(model, TwoStageDetector):
        from torch_detection_tpu.models.detectors import MaskRCNN

        roi_size = getattr(det_cfg, "roi_size", 7)
        feat_ch = cfg["model"]["neck"]["out_channels"]
        vars2 = model.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, 8, roi_size, roi_size, feat_ch), jnp.float32),
            method=TwoStageDetector.roi_forward,
        )
        extra_params = dict(vars2["params"])
        if isinstance(model, MaskRCNN):
            mask_roi = getattr(det_cfg, "mask_roi_size", 14)
            vars3 = model.init(
                jax.random.PRNGKey(2),
                jnp.zeros((1, 8, mask_roi, mask_roi, feat_ch), jnp.float32),
                method=MaskRCNN.mask_forward,
            )
            extra_params.update(vars3["params"])
        variables = {
            "params": {**variables["params"], **extra_params},
            "batch_stats": variables.get("batch_stats", {}),
        }
    key_rules = None
    if args.checkpoint.startswith("torch://"):
        # full-detector torch checkpoints (mmdetection naming) need the
        # detector-level rule tables; backbone-only .pth files keep the
        # default torchvision ResNet rules
        from torch_detection_tpu.models.torch_import import (
            faster_rcnn_key_rules,
            load_torch_checkpoint,
            retinanet_key_rules,
        )

        sd = load_torch_checkpoint(args.checkpoint[len("torch://"):])
        if any(k.startswith("backbone.") for k in sd):
            n_lat = len(cfg["model"]["neck"]["in_channels"])
            if isinstance(model, TwoStageDetector):
                key_rules = faster_rcnn_key_rules(num_laterals=n_lat)
            else:
                key_rules = retinanet_key_rules(num_laterals=n_lat)
    variables, _ = load_checkpoint(
        variables, args.checkpoint, strict=False, key_rules=key_rules
    )

    if isinstance(det_cfg, FasterRCNNConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            return faster_rcnn_inference(
                det_cfg, model, variables, image,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

    else:

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            cls, reg = model.apply(variables, image)
            return decode_detections(
                det_cfg, cls, reg, img_shapes=img_shape, scale_factors=scale_factor
            )

    n = len(dataset) if args.max_images is None else min(args.max_images, len(dataset))
    detections, annotations = [], []
    for i in range(n):
        sample = dataset[i]
        per_aug = []
        metas = [m.data for m in sample["img_meta"]]
        for img, meta in zip(sample["img"], metas):
            hw = pick_canvas([img.shape[:2]], canvas=canvas if not args.tta else None)
            padded = np.zeros((1, hw[0], hw[1], 3), np.float32)
            padded[0, : img.shape[0], : img.shape[1]] = img
            res = infer(
                variables,
                jnp.asarray(padded),
                jnp.asarray([[meta["img_shape"][0], meta["img_shape"][1]]], jnp.float32),
                jnp.asarray([1.0]),  # undo scale during TTA merge instead
            )
            v = np.asarray(res.valid[0])
            per_aug.append(
                dict(
                    boxes=np.asarray(res.boxes[0])[v],
                    scores=np.asarray(res.scores[0])[v],
                    labels=np.asarray(res.labels[0])[v],
                )
            )
        fused = merge_tta_detections(per_aug, metas, iou_thr=det_cfg.nms_iou_thr)
        detections.append(
            dict(boxes=fused["boxes"], scores=fused["scores"], labels=fused["labels"] + 1)
        )
        annotations.append(dataset.get_ann_info(i))
        if (i + 1) % 100 == 0:
            logging.info("inferred %d/%d", i + 1, n)

    if args.voc_metric:
        results = eval_voc_map(detections, annotations, det_cfg.num_classes, use_07_metric=True)
    else:
        results = eval_coco_map(detections, annotations, det_cfg.num_classes)
    for k, v in results.items():
        if not isinstance(v, dict):
            logging.info("%s: %.4f", k, v)
    print({k: v for k, v in results.items() if not isinstance(v, dict)})


if __name__ == "__main__":
    main()
