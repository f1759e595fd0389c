#!/usr/bin/env python
"""Dump RPN proposals for a dataset in the reference's proposal_file format.

Produces the pkl the reference's data tier consumes (per-image ``(n, 5)``
float32 ``[x1, y1, x2, y2, score]`` arrays in ORIGINAL image coordinates,
one entry per image in dataset order — ``/root/reference/datasets/
base_dataset.py:100-105,193-200``), from a trained Faster/Mask R-CNN
checkpoint's RPN.  Feed the result to a ``proposal_file=`` dataset and train
the proposal-based ``FastRCNN`` detector on it (the workflow the reference
plumbed but never finished).

The dump always runs over a test-mode (unfiltered) view of the split so the
list aligns with the raw annotation order; train-mode datasets re-index it
through their own ``valid_inds`` filter at load time (data/base.py:97-101).

Usage: python tools/dump_proposals.py CONFIG CHECKPOINT --split val \\
           --out proposals_val.pkl [--batch 4] [--top-k 1000]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description="dump RPN proposals to pkl")
    parser.add_argument("config")
    parser.add_argument("checkpoint", help="orbax dir or torch://path.pth")
    parser.add_argument("--split", choices=("train", "val"), default="val")
    parser.add_argument("--out", required=True, help="output .pkl path")
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--top-k", type=int, default=1000,
                        help="proposals kept per image (post-NMS slate)")
    parser.add_argument("--max-images", type=int, default=None)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_detection_tpu.builder import (
        build_detection_cfg,
        build_detector,
        init_detector_variables,
    )
    from torch_detection_tpu.data import get_datasets
    from torch_detection_tpu.data.collate import pick_canvas
    from torch_detection_tpu.engine import load_checkpoint
    from torch_detection_tpu.models.detectors import TwoStageDetector
    from torch_detection_tpu.models.heads.rpn_head import generate_proposals
    from torch_detection_tpu.utils import Config
    from torch_detection_tpu.utils.file_handler import dump

    cfg = Config.fromfile(args.config)
    runtime = cfg.get("runtime", {})
    model = build_detector(cfg["model"], runtime.get("compute_dtype"))
    det_cfg = build_detection_cfg(cfg["detection"])
    if not isinstance(model, TwoStageDetector):
        raise SystemExit("dump_proposals needs a TwoStageDetector (RPN) config")

    # unfiltered test-mode view of the chosen split, single scale, no flip
    split_cfg = dict(cfg["data"][args.split])
    sizes = split_cfg.get("img_expected_sizes")
    if isinstance(sizes, list):
        split_cfg["img_expected_sizes"] = sizes[0]
    split_cfg["flip_ratio"] = 0
    split_cfg["test_mode"] = True
    split_cfg.pop("proposal_file", None)
    dataset = get_datasets(split_cfg)

    canvas = tuple(cfg["data"].get("canvas") or (800, 1344))
    x = jnp.zeros((1, canvas[0], canvas[1], 3), jnp.float32)
    variables = init_detector_variables(model, det_cfg, cfg["model"], x)
    variables, _ = load_checkpoint(variables, args.checkpoint, strict=False)

    prop_cfg = dataclasses.replace(det_cfg.proposal_test, post_nms_top_k=args.top_k)

    @jax.jit
    def rpn_proposals(variables, image, img_shape):
        _, rpn_scores, rpn_deltas = model.apply(variables, image)
        return generate_proposals(
            prop_cfg, det_cfg.anchor_generator, rpn_scores, rpn_deltas,
            img_shapes=img_shape,
        )

    n = len(dataset) if args.max_images is None else min(args.max_images, len(dataset))
    out = [None] * n
    pending = {}  # bucket -> list of (idx, img, img_shape, scale_factor)

    def flush(bucket, items):
        padded = np.zeros((args.batch, bucket[0], bucket[1], 3), np.float32)
        shapes = np.ones((args.batch, 2), np.float32)
        for j, (_, img, img_shape, _) in enumerate(items):
            padded[j, : img.shape[0], : img.shape[1]] = img
            shapes[j] = img_shape
        props = rpn_proposals(variables, jnp.asarray(padded), jnp.asarray(shapes))
        boxes = np.asarray(props.boxes, np.float32)
        scores = np.asarray(props.scores, np.float32)
        valid = np.asarray(props.valid)
        for j, (idx, _, _, sf) in enumerate(items):
            v = valid[j]
            # canvas frame -> original image coordinates
            out[idx] = np.hstack(
                [boxes[j][v] / float(sf), scores[j][v, None]]
            ).astype(np.float32)

    for i in range(n):
        sample = dataset[i]
        img = sample["img"][0]
        meta = sample["img_meta"][0].data
        bucket = pick_canvas([img.shape[:2]], canvas=canvas)
        items = pending.setdefault(bucket, [])
        items.append((i, img, meta["img_shape"][:2], meta["scale_factor"]))
        if len(items) == args.batch:
            flush(bucket, items)
            pending[bucket] = []
        if (i + 1) % 100 == 0:
            logging.info("proposals: %d/%d images", i + 1, n)
    for bucket, items in pending.items():
        if items:
            flush(bucket, items)

    dump(out, args.out)
    counts = [len(p) for p in out]
    logging.info(
        "wrote %s: %d images, proposals/image min %d mean %.1f max %d",
        args.out, n, min(counts), float(np.mean(counts)), max(counts),
    )


if __name__ == "__main__":
    main()
