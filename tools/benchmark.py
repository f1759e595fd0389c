#!/usr/bin/env python
"""Benchmark the five BASELINE.json configs on the current default device.

Prints one JSON line per config.  ``bench.py`` at the repo root remains the
single-line headline benchmark; this tool gives the full table:

  1. ResNet-50 backbone forward (incl. host transforms)
  2. VOC-style pipeline (random-flip + pad-to-divisor) -> ResNet-101 backbone
  3. ResNet-50 + FPN multi-scale feature extraction
  4. anchor generation + IoU assignment + delta encode/decode (all levels)
  5. end-to-end detection inference (preprocess + model + decode + NMS)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, iters=10):
    """Chained-dispatch timing: one readback at the end covers all iters."""
    import jax.numpy as jnp

    acc = jnp.zeros(())
    acc = fn(acc)
    float(acc)  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = fn(acc)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from torch_detection_tpu.data.ops.image import (
        img_flip,
        img_normalize,
        img_pad_size_divisor,
        img_resize,
    )
    from torch_detection_tpu.models.backbones import ResNet
    from torch_detection_tpu.models.detectors import RetinaNetConfig, decode_detections
    from torch_detection_tpu.models.necks import FPN
    from torch_detection_tpu.ops import MaxIoUAssigner, bbox2delta, delta2bbox
    from torch_detection_tpu.ops.anchors import AnchorGenerator
    from torch_detection_tpu.ops.preprocess import fused_normalize_pad
    from __graft_entry__ import _build_model

    float(jnp.sum(jnp.ones((8, 8))))  # warm device/tunnel
    B = args.batch
    HW = (800, 1216)
    rng = np.random.default_rng(0)
    results = []

    # ---- config 1: host transforms + ResNet-50 backbone forward
    raw = rng.integers(0, 255, (B, 640, 960, 3), np.uint8)
    backbone = ResNet(depth=50, out_indices=(1, 2, 3), dtype=jnp.bfloat16)
    xb0 = jnp.zeros((B, *HW, 3), jnp.bfloat16)
    vars50 = jax.jit(backbone.init)(jax.random.PRNGKey(0), xb0)

    t_host0 = time.perf_counter()
    batch = np.zeros((B, *HW, 3), np.float32)
    for i in range(B):
        img = img_normalize(raw[i], (123.675, 116.28, 103.53), (58.395, 57.12, 57.375))
        img, sf = img_resize(img, size=(1333, 800), return_scale=True)
        img, _, _ = img_flip(img, 0.5, rng=rng)
        img = img_pad_size_divisor(img, 32)
        batch[i, : img.shape[0], : img.shape[1]] = img
    host_dt = time.perf_counter() - t_host0
    xb = jnp.asarray(batch, jnp.bfloat16)

    @jax.jit
    def cfg1(acc):
        return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in backbone.apply(vars50, xb))

    dt = timed(cfg1, args.iters)
    results.append({
        "config": "1: transforms + R50 backbone fwd",
        "images_per_sec": round(B / dt, 2),
        "host_transform_ms_per_img": round(host_dt / B * 1000, 2),
    })

    # ---- config 2: VOC pipeline (600x1024 canvas) -> ResNet-101 backbone
    voc_hw = (608, 1024)
    backbone101 = ResNet(depth=101, out_indices=(1, 2, 3), dtype=jnp.bfloat16)
    xv = jnp.asarray(rng.normal(size=(B, *voc_hw, 3)), jnp.bfloat16)
    vars101 = jax.jit(backbone101.init)(jax.random.PRNGKey(0), xv)

    @jax.jit
    def cfg2(acc):
        return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in backbone101.apply(vars101, xv))

    dt = timed(cfg2, args.iters)
    results.append({"config": "2: VOC pipeline + R101 backbone fwd", "images_per_sec": round(B / dt, 2)})

    # ---- config 3: R50 + FPN multi-scale features
    fpn = FPN(in_channels=(512, 1024, 2048), out_channels=256, num_outs=5,
              add_extra_convs=True, relu_before_extra_convs=True, dtype=jnp.bfloat16)
    feats0 = backbone.apply(vars50, xb0)
    vars_fpn = jax.jit(fpn.init)(jax.random.PRNGKey(0), feats0)

    @jax.jit
    def bb_fpn(acc, xb):
        feats = backbone.apply(vars50, xb)
        outs = fpn.apply(vars_fpn, feats)
        return acc + sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    dt = timed(lambda acc: bb_fpn(acc, xb), args.iters)
    results.append({"config": "3: R50+FPN multi-scale features", "images_per_sec": round(B / dt, 2)})

    # ---- config 4: anchors + IoU assignment + delta encode/decode
    gen = AnchorGenerator(strides=(8, 16, 32, 64, 128))
    featmap_sizes = gen.featmap_sizes_for(HW)
    assigner = MaxIoUAssigner()
    gt = jnp.asarray(rng.uniform(0, 700, (B, 100, 4)).astype(np.float32))
    gt = gt.at[..., 2:].set(gt[..., :2] + 50)
    gt_labels = jnp.asarray(rng.integers(1, 81, (B, 100)), jnp.int32)
    gt_valid = jnp.ones((B, 100), bool)

    @jax.jit
    def cfg4(acc):
        anchors = gen.flat_anchors(featmap_sizes)

        def one(i):
            res = assigner(anchors, gt[i], gt_valid[i], gt_labels[i])
            safe = jnp.clip(res.assigned_gt_inds - 1, 0, 99)
            deltas = bbox2delta(anchors, gt[i][safe])
            boxes = delta2bbox(anchors, deltas)
            return jnp.sum(deltas) + jnp.sum(boxes) + jnp.sum(res.max_overlaps)

        return acc + jnp.sum(jax.vmap(one)(jnp.arange(B)))

    dt = timed(cfg4, args.iters)
    n_anchors = int(sum(h * w * 9 for h, w in featmap_sizes))
    results.append({
        "config": "4: anchors+assign+delta (all levels)",
        "images_per_sec": round(B / dt, 2),
        "anchors_per_image": n_anchors,
    })

    # ---- config 5: end-to-end inference (preprocess + model + decode + NMS)
    model = _build_model(depth=50, feat_channels=256, num_classes=80, dtype=jnp.bfloat16)
    det_cfg = RetinaNetConfig(num_classes=80)
    vars_full = jax.jit(model.init)(jax.random.PRNGKey(0), xb0)
    xu8 = jnp.asarray(rng.integers(0, 255, (B, *HW, 3), dtype=np.uint8))
    shp = jnp.asarray([[HW[0], HW[1]]] * B, jnp.int32)

    @jax.jit
    def cfg5(acc):
        x = fused_normalize_pad(xu8, shp, out_dtype=jnp.bfloat16)
        cls, reg = model.apply(vars_full, x)
        d = decode_detections(det_cfg, cls, reg)
        return acc + jnp.sum(d.scores)

    dt = timed(cfg5, args.iters)
    results.append({"config": "5: e2e inference incl. preprocess+NMS", "images_per_sec": round(B / dt, 2)})

    # ---- bonus: Faster R-CNN e2e (two-stage, fused RoIAlign)
    from torch_detection_tpu.models.detectors import (
        FasterRCNNConfig,
        TwoStageDetector,
        faster_rcnn_inference,
    )

    frcnn = TwoStageDetector(
        backbone=dict(type="ResNet", depth=50, num_stages=4, out_indices=(0, 1, 2, 3), dtype=jnp.bfloat16),
        neck=dict(type="FPN", in_channels=(256, 512, 1024, 2048), out_channels=256, num_outs=5, dtype=jnp.bfloat16),
        rpn_head=dict(type="RPNHead", in_channels=256, feat_channels=256, num_base_anchors=3, dtype=jnp.bfloat16),
        bbox_head=dict(type="BBoxHead", num_classes=80, fc_channels=1024, dtype=jnp.bfloat16),
    )
    fr_cfg = FasterRCNNConfig(num_classes=80)
    fb = min(B, 4)
    xf = jnp.zeros((fb, *HW, 3), jnp.bfloat16)
    vars_f = jax.jit(frcnn.init)(jax.random.PRNGKey(0), xf)
    vars_roi = frcnn.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 7, 7, 256), jnp.bfloat16),
        method=TwoStageDetector.roi_forward,
    )
    vars_f = {
        "params": {**vars_f["params"], **vars_roi["params"]},
        "batch_stats": vars_f.get("batch_stats", {}),
    }
    xfb = jnp.asarray(rng.normal(size=(fb, *HW, 3)), jnp.bfloat16)

    @jax.jit
    def cfg6(acc):
        d = faster_rcnn_inference(fr_cfg, frcnn, vars_f, xfb)
        return acc + jnp.sum(d.scores)

    dt = timed(cfg6, args.iters)
    results.append({"config": "6: Faster R-CNN e2e inference", "images_per_sec": round(fb / dt, 2)})

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
