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
    parser.add_argument("--batch", type=int, default=8,
                        help="images per inference batch (per canvas bucket)")
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
        from torch_detection_tpu.models.detectors import (
            FCOSConfig,
            SSDConfig,
            decode_fcos,
            decode_ssd,
        )

        if isinstance(det_cfg, FCOSConfig):

            @jax.jit
            def infer(variables, image, img_shape, scale_factor):
                cls, reg, ctr = model.apply(variables, image)
                return decode_fcos(
                    det_cfg, cls, reg, ctr,
                    img_shapes=img_shape, scale_factors=scale_factor,
                )

        else:
            decode_fn = decode_ssd if isinstance(det_cfg, SSDConfig) else decode_detections

            @jax.jit
            def infer(variables, image, img_shape, scale_factor):
                cls, reg = model.apply(variables, image)
                return decode_fn(
                    det_cfg, cls, reg, img_shapes=img_shape, scale_factors=scale_factor
                )

    n = len(dataset) if args.max_images is None else min(args.max_images, len(dataset))

    # ---- batched, bucketed inference: every (image, augmentation) work item
    # is routed to a fixed canvas bucket (coarse 128-px rounding keeps the
    # number of distinct XLA programs small); each bucket flushes in batches
    # of --batch through ONE jitted program per shape.
    results = {}  # (img_idx, aug_idx) -> per-aug detection dict
    pending = {}  # bucket (H, W) -> list of (img_idx, aug_idx, img, img_shape)
    metas_all = [None] * n

    def flush(bucket, items):
        b = len(items)
        pad_to = args.batch
        padded = np.zeros((pad_to, bucket[0], bucket[1], 3), np.float32)
        shapes = np.ones((pad_to, 2), np.float32)
        for j, (_, _, img, img_shape) in enumerate(items):
            padded[j, : img.shape[0], : img.shape[1]] = img
            shapes[j] = img_shape
        res = infer(
            variables, jnp.asarray(padded), jnp.asarray(shapes),
            jnp.ones((pad_to,), jnp.float32),  # undo scale in TTA merge
        )
        boxes = np.asarray(res.boxes)
        scores = np.asarray(res.scores)
        labels = np.asarray(res.labels)
        valid = np.asarray(res.valid)
        for j, (img_idx, aug_idx, _, _) in enumerate(items):
            v = valid[j]
            results[(img_idx, aug_idx)] = dict(
                boxes=boxes[j][v], scores=scores[j][v], labels=labels[j][v]
            )

    done = 0
    for i in range(n):
        sample = dataset[i]
        metas_all[i] = [m.data for m in sample["img_meta"]]
        for aug_idx, (img, meta) in enumerate(zip(sample["img"], metas_all[i])):
            if not args.tta and canvas is not None:
                bucket = pick_canvas([img.shape[:2]], canvas=canvas)
            else:
                bucket = pick_canvas([img.shape[:2]], size_divisor=128)
            items = pending.setdefault(bucket, [])
            items.append((i, aug_idx, img,
                          (meta["img_shape"][0], meta["img_shape"][1])))
            if len(items) == args.batch:
                flush(bucket, items)
                pending[bucket] = []
        done += 1
        if done % 100 == 0:
            logging.info("loaded %d/%d images (%d buckets live)", done, n, len(pending))
    for bucket, items in pending.items():
        if items:
            flush(bucket, items)

    detections, annotations = [], []
    for i in range(n):
        per_aug = [results[(i, a)] for a in range(len(metas_all[i]))]
        fused = merge_tta_detections(per_aug, metas_all[i], iou_thr=det_cfg.nms_iou_thr)
        detections.append(
            dict(boxes=fused["boxes"], scores=fused["scores"], labels=fused["labels"] + 1)
        )
        annotations.append(dataset.get_ann_info(i))

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
