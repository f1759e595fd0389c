#!/usr/bin/env python
"""Visualize detections on images (parity with the reference's cv2
visualizers: ``datasets/utils/bbox.py:51-112`` bbox_visualize and
``datasets/utils/mask.py:47-84`` mask_visualize).

Usage: python tools/visualize.py CONFIG CKPT IMG [IMG...] --out-dir vis/
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description="visualize detections")
    parser.add_argument("config")
    parser.add_argument("checkpoint")
    parser.add_argument("images", nargs="+")
    parser.add_argument("--out-dir", default="vis")
    parser.add_argument("--score-thr", type=float, default=0.3)
    parser.add_argument("--segm", action="store_true",
                        help="overlay instance masks too (Mask R-CNN configs)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from torch_detection_tpu.builder import build_detection_cfg, build_detector
    from torch_detection_tpu.data.ops.bbox import bbox_visualize
    from torch_detection_tpu.data.ops.image import (
        img_normalize,
        img_pad_size_divisor,
        img_read,
        img_resize,
    )
    from torch_detection_tpu.engine import load_checkpoint
    from torch_detection_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    runtime = cfg.get("runtime", {})
    model = build_detector(cfg["model"], runtime.get("compute_dtype"))
    det_cfg = build_detection_cfg(cfg["detection"])
    train_cfg = cfg["data"]["train"]
    means = tuple(train_cfg.get("img_means", (123.675, 116.28, 103.53)))
    stds = tuple(train_cfg.get("img_stds", (58.395, 57.12, 57.375)))
    sizes = train_cfg.get("img_expected_sizes", (1333, 800))
    if isinstance(sizes, list):
        sizes = sizes[0]
    classes = None  # datasets carry class names; configs may add them later

    os.makedirs(args.out_dir, exist_ok=True)
    canvas = tuple(cfg["data"].get("canvas") or (800, 1344))
    from torch_detection_tpu.builder import init_detector_variables

    x0 = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    variables = init_detector_variables(model, det_cfg, cfg["model"], x0)
    variables, _ = load_checkpoint(variables, args.checkpoint, strict=False)

    # one jitted inference program for any detector family (same dispatch
    # as the evaluator and the in-training validation hook)
    from torch_detection_tpu.engine.validate import make_inference_fn

    infer = make_inference_fn(model, det_cfg, segm=args.segm)

    for path in args.images:
        raw = img_read(path)
        img = img_normalize(raw, means, stds)
        img, sf = img_resize(img, size=tuple(sizes), return_scale=True)
        hw = img.shape[:2]
        img = img_pad_size_divisor(img, 32)
        padded = np.zeros((1, canvas[0], canvas[1], 3), np.float32)
        padded[0, : img.shape[0], : img.shape[1]] = img
        shapes = jnp.asarray([[hw[0], hw[1]]], jnp.float32)
        sfs = jnp.asarray([sf], jnp.float32)
        dets = infer(variables, jnp.asarray(padded), shapes, sfs)
        v = np.asarray(dets.valid[0])
        boxes = np.asarray(dets.boxes[0])[v]
        scores = np.asarray(dets.scores[0])[v]
        labels = np.asarray(dets.labels[0])[v]
        base = raw.copy()
        out_file = os.path.join(args.out_dir, os.path.basename(path))
        if args.segm and hasattr(dets, "mask_probs"):
            # detections are already in original-frame coords (scale_factors
            # was passed to the inference program), so paste directly
            from torch_detection_tpu.data.ops.mask import mask_visualize
            from torch_detection_tpu.models.heads import paste_masks_np

            probs = np.asarray(dets.mask_probs[0])[v]
            keep = scores > args.score_thr
            masks = paste_masks_np(probs[keep], boxes[keep], raw.shape[:2])
            base = mask_visualize(base, masks, None, show=False)
        drawn, _ = bbox_visualize(
            base,
            np.concatenate([boxes, scores[:, None]], axis=1),
            labels,
            class_names=classes,
            score_thr=args.score_thr,
            show=False,
            out_file=out_file,
        )
        logging.info("%s: %d detections above %.2f", path, int((scores > args.score_thr).sum()), args.score_thr)


if __name__ == "__main__":
    main()
