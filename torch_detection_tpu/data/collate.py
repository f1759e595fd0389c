"""Batch collation into fixed-shape, TPU-ready arrays.

Parity surface: reference ``datasets/loader/collate.py:10-78`` (TCGGroup/
Torch_Detection): cpu_only fields -> python lists, stack=True fields -> pad
to per-batch max then stack, stack=False -> list of arrays.

TPU-first redesign: XLA compiles one program per input shape, so this
collate makes shapes *static*:

  * images pad to a canvas: an explicit (H, W), the smallest fitting bucket
    from ``canvas_buckets``, or the per-batch max rounded up to
    ``size_divisor`` (fallback — may recompile across batches);
  * ragged gt boxes/labels pad to ``max_gts`` rows + a validity mask
    (the reference's ``bbox_pad`` idea, ``datasets/utils/bbox.py:238-256``,
    extended with the mask the on-device assigner consumes);
  * the returned ``batch`` dict contains only numpy arrays (device-bound)
    plus ``img_meta`` (host-side list of dicts).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .container import DataContainer


def _round_up(v: int, d: int) -> int:
    return int(np.ceil(v / d) * d)


def pick_canvas(
    shapes: Sequence[Tuple[int, int]],
    canvas: Optional[Tuple[int, int]] = None,
    canvas_buckets: Optional[Sequence[Tuple[int, int]]] = None,
    size_divisor: int = 32,
) -> Tuple[int, int]:
    """Choose the (H, W) all images in the batch are padded to."""
    max_h = max(s[0] for s in shapes)
    max_w = max(s[1] for s in shapes)
    if canvas is not None:
        assert canvas[0] >= max_h and canvas[1] >= max_w, (
            f"canvas {canvas} smaller than batch max ({max_h}, {max_w})"
        )
        return tuple(canvas)
    if canvas_buckets:
        fitting = [b for b in canvas_buckets if b[0] >= max_h and b[1] >= max_w]
        if fitting:
            return min(fitting, key=lambda b: b[0] * b[1])
    return (_round_up(max_h, size_divisor), _round_up(max_w, size_divisor))


def collate(
    samples: List[Dict],
    max_gts: int = 100,
    canvas: Optional[Tuple[int, int]] = None,
    canvas_buckets: Optional[Sequence[Tuple[int, int]]] = None,
    size_divisor: int = 32,
    s2d: bool = False,
    max_proposals: Optional[int] = None,
) -> Dict:
    """Collate training samples (dicts of DataContainers) into one batch.

    ``s2d=True`` ships the image batch on the 2x2 space-to-depth wire
    (B, H/2, W/2, 4C) for ``stem_s2d`` backbones — the relayout is a cheap
    numpy strided copy here on the host; done on-device it costs ~4 ms per
    b8 800x1216 batch (measured r3).  Geometry tensors (gt, img_shape,
    scale_factor) stay in original coordinates.
    """
    assert len(samples) > 0
    imgs = [s["img"].data for s in samples]
    hw = pick_canvas([im.shape[:2] for im in imgs], canvas, canvas_buckets, size_divisor)

    b = len(samples)
    c = imgs[0].shape[-1]
    batch_img = np.zeros((b, hw[0], hw[1], c), imgs[0].dtype)
    for i, im in enumerate(imgs):
        batch_img[i, : im.shape[0], : im.shape[1]] = im

    gt_boxes = np.zeros((b, max_gts, 4), np.float32)
    gt_labels = np.zeros((b, max_gts), np.int32)
    gt_valid = np.zeros((b, max_gts), bool)
    for i, s in enumerate(samples):
        boxes = s["gt_bboxes"].data
        n = min(len(boxes), max_gts)
        gt_boxes[i, :n] = boxes[:n]
        gt_valid[i, :n] = True
        if "gt_labels" in s:
            labels = np.asarray(s["gt_labels"].data)
            gt_labels[i, :n] = labels[:n]

    img_metas = [s["img_meta"].data for s in samples]
    img_shapes = np.asarray([m["img_shape"][:2] for m in img_metas], np.float32)
    scale_factors = np.asarray([m["scale_factor"] for m in img_metas], np.float32)

    batch = dict(
        image=batch_img,
        gt_boxes=gt_boxes,
        gt_labels=gt_labels,
        gt_valid=gt_valid,
        img_shape=img_shapes,
        scale_factor=scale_factors,
        img_meta=img_metas,
    )

    if "gt_bboxes_ignore" in samples[0]:
        ig_boxes = np.zeros((b, max_gts, 4), np.float32)
        ig_valid = np.zeros((b, max_gts), bool)
        for i, s in enumerate(samples):
            boxes = s["gt_bboxes_ignore"].data
            n = min(len(boxes), max_gts)
            if n:
                ig_boxes[i, :n] = boxes[:n]
                ig_valid[i, :n] = True
        batch["gt_boxes_ignore"] = ig_boxes
        batch["gt_ignore_valid"] = ig_valid

    if "proposals" in samples[0]:
        width = samples[0]["proposals"].data.shape[-1]
        # pad to a FIXED slate when max_proposals is given (one jitted train
        # program regardless of per-batch proposal counts); else batch max
        n_prop = max_proposals or max(len(s["proposals"].data) for s in samples)
        props = np.zeros((b, n_prop, width), np.float32)
        prop_valid = np.zeros((b, n_prop), bool)
        for i, s in enumerate(samples):
            p = s["proposals"].data[:n_prop]
            props[i, : len(p)] = p
            prop_valid[i, : len(p)] = True
        batch["proposals"] = props
        batch["proposal_valid"] = prop_valid

    if "gt_masks" in samples[0]:
        # masks pad to (B, G, H, W) uint8 with G BUCKETED to the smallest of
        # {8, 16, 32, 64, max_gts} covering the batch's max gt count (r4):
        # the on-device mask-target pyramid and the host->device wire both
        # cost linearly in G, and typical COCO batches carry ~10-30 valid
        # gts of the max_gts=100 slate — all-zero channels were ~70% of the
        # mask-target tier.  Semantics-exact: rois only ever match VALID
        # gts, which occupy the slate prefix.  Bounded program count: one
        # XLA train program per (canvas bucket, G bucket).
        n_max = max(min(len(s["gt_masks"].data), max_gts) for s in samples)
        g = next((bk for bk in (8, 16, 32, 64) if n_max <= bk < max_gts), max_gts)
        masks = np.zeros((b, g, hw[0], hw[1]), np.uint8)
        for i, s in enumerate(samples):
            m = s["gt_masks"].data
            n = min(len(m), g)
            if n:
                masks[i, :n, : m.shape[1], : m.shape[2]] = m[:n]
        batch["gt_masks"] = masks

    if s2d:
        from ..ops.preprocess import space_to_depth_2x2_np

        batch["image"] = space_to_depth_2x2_np(batch["image"])
    return batch


def collate_test(samples: List[Dict]) -> Dict:
    """Collate test samples (multi-scale x flip lists) for TTA evaluation.

    Returns {'imgs': [per-aug (B,H,W,C)], 'img_metas': [per-aug list of
    dicts]}; each aug slot is padded independently.
    """
    n_augs = len(samples[0]["img"])
    out_imgs, out_metas = [], []
    for a in range(n_augs):
        imgs = [s["img"][a] for s in samples]
        hw = pick_canvas([im.shape[:2] for im in imgs])
        b = len(samples)
        arr = np.zeros((b, hw[0], hw[1], imgs[0].shape[-1]), imgs[0].dtype)
        for i, im in enumerate(imgs):
            arr[i, : im.shape[0], : im.shape[1]] = im
        out_imgs.append(arr)
        out_metas.append([s["img_meta"][a].data for s in samples])
    return dict(imgs=out_imgs, img_metas=out_metas)
