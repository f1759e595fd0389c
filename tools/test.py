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


def main() -> None:
    parser = argparse.ArgumentParser(description="evaluate a detector")
    parser.add_argument("config")
    parser.add_argument("checkpoint", help="orbax dir or torch://path.pth")
    parser.add_argument("--tta", action="store_true", help="multi-scale x flip fusion")
    parser.add_argument("--batch", type=int, default=8,
                        help="images per inference batch (per canvas bucket)")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--voc-metric", action="store_true", help="VOC AP@0.5 instead of COCO mAP")
    parser.add_argument("--segm", action="store_true",
                        help="mask-IoU COCO metrics too (Mask R-CNN configs; "
                             "pastes masks in the original frame, reports segm_*)")
    parser.add_argument("--shard-eval", action="store_true",
                        help="shard eval batches over all devices (data-parallel inference)")
    parser.add_argument("--out", default=None,
                        help="dump detections: .json = COCO results format "
                             "(submission-compatible), .pkl = raw per-image dicts")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")

    import jax
    import jax.numpy as jnp

    from torch_detection_tpu.builder import build_detection_cfg, build_detector
    from torch_detection_tpu.data import get_datasets
    from torch_detection_tpu.engine import load_checkpoint
    from torch_detection_tpu.models.detectors import TwoStageDetector
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
    if args.segm:
        val_cfg["with_mask"] = True  # gt masks needed for mask-IoU metrics
    dataset = get_datasets(val_cfg)

    from torch_detection_tpu.builder import init_detector_variables

    canvas = tuple(cfg["data"].get("canvas") or (800, 1344))
    x = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    variables = init_detector_variables(model, det_cfg, cfg["model"], x)
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

    from torch_detection_tpu.engine.validate import (
        coco_detection_dump,
        coco_segm_dump,
        evaluate_detector,
    )

    mesh = None
    if args.shard_eval and len(jax.devices()) > 1:
        from torch_detection_tpu.parallel import make_mesh

        mesh = make_mesh(model=1)
        if args.batch % mesh.shape["data"]:
            parser.error(f"--batch {args.batch} not divisible by {mesh.shape['data']} devices")
    results = evaluate_detector(
        model, det_cfg, variables, dataset,
        batch=args.batch, canvas=canvas, max_images=args.max_images,
        tta=args.tta, voc_metric=args.voc_metric,
        return_detections=bool(args.out), mesh=mesh, segm=args.segm,
    )
    if args.out:
        results, detections = results
        from torch_detection_tpu.utils import dump

        if args.out.endswith(".json"):
            payload = coco_detection_dump(dataset, detections)
            if args.segm:
                segm_out = args.out[: -len(".json")] + ".segm.json"
                dump(coco_segm_dump(dataset, detections), segm_out)
                logging.info("dumped segm RLE results to %s", segm_out)
        else:
            import numpy as np

            payload = [
                {k: np.asarray(v) for k, v in d.items()} for d in detections
            ]
        dump(payload, args.out)
        logging.info("dumped %d images of detections to %s", len(detections), args.out)
    for k, v in results.items():
        logging.info("%s: %.4f", k, v)
    print(results)


if __name__ == "__main__":
    main()
