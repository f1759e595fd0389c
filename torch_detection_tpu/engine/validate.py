"""Reusable detector evaluation: batched, bucketed inference over a dataset.

Factored out of tools/test.py so the SAME protocol drives both the CLI
evaluator and the Trainer's in-training validation hook (the mmdetection
workflow the reference's lineage implies: eval every N epochs, keep the
best-mAP checkpoint).  The reference itself never shipped an evaluator
(SURVEY.md §2 #33 [ABSENT]); the protocol here is the COCO/VOC standard.

Design notes (TPU):
* every (image, augmentation) work item routes to a fixed canvas bucket so
  the number of distinct XLA programs stays small (one jitted program per
  (bucket, batch) shape);
* each bucket flushes through ONE jitted inference fn in fixed-size padded
  batches — no shape polymorphism, no retraces after warmup.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def make_inference_fn(model, det_cfg, segm: bool = False) -> Callable:
    """Jitted ``infer(variables, image, img_shape, scale_factor)`` for any
    detector family implied by ``det_cfg``.

    ``segm=True`` routes mask-capable detectors through the mask branch so
    the returned detections carry per-detection ``mask_probs``.
    """
    import jax

    if segm:
        from ..models.detectors import (
            CascadeMaskRCNNConfig,
            MaskRCNNConfig,
            SOLOV2Config,
            cascade_mask_rcnn_inference,
            decode_solov2,
            mask_rcnn_inference,
        )

        if isinstance(det_cfg, SOLOV2Config):

            @jax.jit
            def infer(variables, image, img_shape, scale_factor):
                cls, kern, mfeat = model.apply(variables, image)
                return decode_solov2(
                    det_cfg, cls, kern, mfeat,
                    img_shapes=img_shape, scale_factors=scale_factor,
                )

            return infer

        if isinstance(det_cfg, CascadeMaskRCNNConfig):

            @jax.jit
            def infer(variables, image, img_shape, scale_factor):
                return cascade_mask_rcnn_inference(
                    det_cfg, model, variables, image,
                    img_shapes=img_shape, scale_factors=scale_factor,
                )

            return infer

        if not isinstance(det_cfg, MaskRCNNConfig):
            raise ValueError(
                "segm=True needs a mask-capable detector (MaskRCNNConfig or "
                f"CascadeMaskRCNNConfig); got {type(det_cfg).__name__}"
            )

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            return mask_rcnn_inference(
                det_cfg, model, variables, image,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import (
        ATSSConfig,
        CascadeRCNNConfig,
        FasterRCNNConfig,
        FCOSConfig,
        SSDConfig,
        cascade_rcnn_inference,
        decode_atss,
        decode_detections,
        decode_fcos,
        decode_ssd,
        faster_rcnn_inference,
    )
    from ..models.detectors import SOLOV2Config, decode_solov2
    from ..ops.nms import NMSResult as _NMSResult

    if isinstance(det_cfg, SOLOV2Config):
        # box-mAP eval of a box-free family: boxes come from mask extents

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            cls, kern, mfeat = model.apply(variables, image)
            d = decode_solov2(
                det_cfg, cls, kern, mfeat,
                img_shapes=img_shape, scale_factors=scale_factor,
            )
            return _NMSResult(d.boxes, d.scores, d.labels, d.valid, None)

        return infer

    from ..models.detectors import YOLOV3Config, decode_yolo

    if isinstance(det_cfg, YOLOV3Config):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            pred_maps = model.apply(variables, image)
            return decode_yolo(
                det_cfg, pred_maps,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import YOLOXConfig, decode_yolox

    if isinstance(det_cfg, YOLOXConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            cls, reg, obj = model.apply(variables, image)
            return decode_yolox(
                det_cfg, cls, reg, obj,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    if isinstance(det_cfg, CascadeRCNNConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            return cascade_rcnn_inference(
                det_cfg, model, variables, image,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    if isinstance(det_cfg, FasterRCNNConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            return faster_rcnn_inference(
                det_cfg, model, variables, image,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import FastRCNNConfig, fast_rcnn_inference

    if isinstance(det_cfg, FastRCNNConfig):
        # proposal-based: the evaluator threads the dataset's (transformed)
        # proposal slate through as two extra arguments
        @jax.jit
        def infer(variables, image, img_shape, scale_factor, proposals, proposal_valid):
            return fast_rcnn_inference(
                det_cfg, model, variables, image, proposals, proposal_valid,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import CenterNetConfig, decode_centernet

    if isinstance(det_cfg, CenterNetConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            heat, wh, off = model.apply(variables, image)
            return decode_centernet(
                det_cfg, heat, wh, off,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import SparseRCNNConfig, decode_sparse_rcnn

    if isinstance(det_cfg, SparseRCNNConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            cls, box = model.apply(variables, image, img_shapes=img_shape)
            return decode_sparse_rcnn(
                det_cfg, cls, box,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import DETRConfig, decode_detr

    if isinstance(det_cfg, DETRConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            cls, box = model.apply(variables, image, img_shapes=img_shape)
            return decode_detr(
                det_cfg, cls, box,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import GFLConfig, decode_gfl

    if isinstance(det_cfg, GFLConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            cls, reg = model.apply(variables, image)
            return decode_gfl(
                det_cfg, cls, reg,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import FoveaConfig, decode_fovea

    if isinstance(det_cfg, FoveaConfig):

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            cls, reg = model.apply(variables, image)
            return decode_fovea(
                det_cfg, cls, reg,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    from ..models.detectors import PAAConfig, decode_paa

    if isinstance(det_cfg, (FCOSConfig, ATSSConfig, PAAConfig)):
        # all three heads emit (cls, reg, third-branch); only the decode
        # semantics differ (centerness vs IoU-pred rescoring)
        if isinstance(det_cfg, PAAConfig):
            decode3 = decode_paa
        elif isinstance(det_cfg, ATSSConfig):
            decode3 = decode_atss
        else:
            decode3 = decode_fcos

        @jax.jit
        def infer(variables, image, img_shape, scale_factor):
            cls, reg, ctr = model.apply(variables, image)
            return decode3(
                det_cfg, cls, reg, ctr,
                img_shapes=img_shape, scale_factors=scale_factor,
            )

        return infer

    decode_fn = decode_ssd if isinstance(det_cfg, SSDConfig) else decode_detections

    @jax.jit
    def infer(variables, image, img_shape, scale_factor):
        cls, reg = model.apply(variables, image)
        return decode_fn(
            det_cfg, cls, reg, img_shapes=img_shape, scale_factors=scale_factor
        )

    return infer


def evaluate_detector(
    model,
    det_cfg,
    variables: Dict[str, Any],
    dataset,
    batch: int = 8,
    canvas=None,
    max_images: Optional[int] = None,
    tta: bool = False,
    voc_metric: bool = False,
    infer: Optional[Callable] = None,
    return_detections: bool = False,
    mesh=None,
    segm: bool = False,
):
    """Run inference over ``dataset`` (a test-mode dataset) and return the
    mAP metric dict from the protocol-exact evaluator.

    ``infer`` may be passed in to reuse a jitted program across epochs (the
    Trainer's validation hook does; re-jitting per epoch would recompile).

    ``segm=True`` (Mask R-CNN style detectors) additionally pastes each
    detection's mask onto the original image frame and reports mask-IoU
    COCO metrics under ``segm_*`` keys; the returned detections then carry
    ``masks`` as a list of COCO RLE dicts (streamed per image through the
    native codec — full-resolution masks are never retained, so a full val
    set fits in memory).  With ``tta=True``, boxes fuse across
    augmentations via NMS (which SELECTS candidates, so mask provenance
    survives): each kept detection's mask patch comes from its source
    augmentation, unflipped, and is pasted at its fused original-frame box.
    """
    import jax.numpy as jnp

    from ..data.collate import pick_canvas
    from ..data.ops.mask import rle_encode
    from .eval import eval_coco_map, eval_coco_segm_map, eval_voc_map
    from .tta import masks_to_original, merge_tta_detections

    from ..models.detectors import FastRCNNConfig

    if infer is None:
        infer = make_inference_fn(model, det_cfg, segm=segm)

    # sharded evaluation: each flushed bucket batch shards over the mesh's
    # ``data`` axis (images are independent, so per-image math is identical
    # to single-device; GSPMD just spreads them across chips), params stay
    # replicated.  ``batch`` should be a multiple of the data-axis size.
    put_batch = None
    if mesh is not None:
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as _P

        _bs = NamedSharding(mesh, _P("data"))
        _rep = NamedSharding(mesh, _P())
        variables = _jax.device_put(variables, _rep)
        put_batch = lambda a: _jax.device_put(a, _bs)

    needs_props = isinstance(det_cfg, FastRCNNConfig)
    prop_cap = int(getattr(dataset, "num_max_proposals", 1000)) if needs_props else 0

    n = len(dataset) if max_images is None else min(max_images, len(dataset))
    results: Dict = {}  # (img_idx, aug_idx) -> per-aug detection dict
    pending: Dict = {}  # bucket (H, W) -> list of (img_idx, aug_idx, img, img_shape, prop)
    metas_all = [None] * n

    def flush(bucket, items):
        pad_to = batch
        padded = np.zeros((pad_to, bucket[0], bucket[1], 3), np.float32)
        shapes = np.ones((pad_to, 2), np.float32)
        for j, (_, _, img, img_shape, _) in enumerate(items):
            padded[j, : img.shape[0], : img.shape[1]] = img
            shapes[j] = img_shape
        extra = ()
        if needs_props:
            props = np.zeros((pad_to, prop_cap, 4), np.float32)
            pvalid = np.zeros((pad_to, prop_cap), bool)
            for j, (_, _, _, _, prop) in enumerate(items):
                p = np.asarray(prop, np.float32)[:prop_cap, :4]
                props[j, : len(p)] = p
                pvalid[j, : len(p)] = True
            extra = (jnp.asarray(props), jnp.asarray(pvalid))
        args = (jnp.asarray(padded), jnp.asarray(shapes),
                jnp.ones((pad_to,), jnp.float32))  # undo scale in TTA merge
        if put_batch is not None:
            args = tuple(put_batch(a) for a in args)
            extra = tuple(put_batch(a) for a in extra)
        res = infer(variables, *args, *extra)
        boxes = np.asarray(res.boxes)
        scores = np.asarray(res.scores)
        labels = np.asarray(res.labels)
        valid = np.asarray(res.valid)
        mask_probs = np.asarray(res.mask_probs) if hasattr(res, "mask_probs") else None
        for j, (img_idx, aug_idx, _, _, _) in enumerate(items):
            v = valid[j]
            d = dict(boxes=boxes[j][v], scores=scores[j][v], labels=labels[j][v])
            if mask_probs is not None:
                d["mask_probs"] = mask_probs[j][v]
            results[(img_idx, aug_idx)] = d

    done = 0
    for i in range(n):
        sample = dataset[i]
        metas_all[i] = [m.data for m in sample["img_meta"]]
        for aug_idx, (img, meta) in enumerate(zip(sample["img"], metas_all[i])):
            if not tta and canvas is not None:
                bucket = pick_canvas([img.shape[:2]], canvas=canvas)
            else:
                bucket = pick_canvas([img.shape[:2]], size_divisor=128)
            items = pending.setdefault(bucket, [])
            prop = sample["proposals"][aug_idx] if needs_props else None
            items.append(
                (i, aug_idx, img, (meta["img_shape"][0], meta["img_shape"][1]), prop)
            )
            if len(items) == batch:
                flush(bucket, items)
                pending[bucket] = []
        done += 1
        if done % 100 == 0:
            logger.info("eval: loaded %d/%d images (%d buckets live)", done, n, len(pending))
    for bucket, items in pending.items():
        if items:
            flush(bucket, items)

    detections, annotations = [], []
    for i in range(n):
        if segm:
            per_aug = [results[(i, a)] for a in range(len(metas_all[i]))]
            for det in per_aug:
                if "mask_probs" not in det:
                    raise ValueError(
                        "segm=True needs inference results carrying "
                        "'mask_probs' — pass a mask-capable `infer` "
                        "(make_inference_fn(..., segm=True))"
                    )
            if len(per_aug) > 1 and not tta:
                raise ValueError(
                    "dataset yields multiple test augmentations but tta=False; "
                    "segm evaluation would silently discard all but aug 0 — "
                    "pass tta=True (provenance-keeping fusion) or configure a "
                    "single-aug val dataset"
                )
            oh, ow = metas_all[i][0]["ori_shape"][:2]
            if not tta:
                # single-aug: detections already NMS'd in their own frame —
                # map boxes + paste masks to the original frame directly.
                det0 = per_aug[0]
                masks, boxes_o = masks_to_original(
                    det0["mask_probs"], det0["boxes"], metas_all[i][0],
                )
                det_out = dict(
                    boxes=boxes_o.astype(np.float32), scores=det0["scores"],
                    labels=det0["labels"] + 1,
                )
            else:
                # TTA: unflip each aug's mask patches into original-frame
                # orientation, fuse boxes with NMS, and paste each kept
                # detection's source patch at its fused original-frame box.
                from ..models.heads import paste_masks_np

                probs_per_aug = []
                for det, meta in zip(per_aug, metas_all[i]):
                    p = np.asarray(det["mask_probs"], np.float32)
                    if meta.get("flipped_flag"):
                        if meta.get("flipped_direction", "horizontal") == "horizontal":
                            p = p[:, :, ::-1]
                        else:
                            p = p[:, ::-1, :]
                    probs_per_aug.append(p)
                fused = merge_tta_detections(
                    per_aug, metas_all[i],
                    iou_thr=getattr(det_cfg, "nms_iou_thr", 0.5),
                    extras=probs_per_aug,
                )
                masks = paste_masks_np(fused["extras"], fused["boxes"], (oh, ow))
                det_out = dict(
                    boxes=fused["boxes"].astype(np.float32),
                    scores=fused["scores"], labels=fused["labels"] + 1,
                )
            # stream to RLE immediately — never retain dense masks across
            # images (ADVICE r3: full-res retention OOMs at COCO val scale)
            det_out["masks"] = [rle_encode(m) for m in np.asarray(masks, np.uint8)]
            detections.append(det_out)
        else:
            per_aug = [results[(i, a)] for a in range(len(metas_all[i]))]
            # DETR has no NMS threshold; TTA box fusion still needs one
            fused = merge_tta_detections(
                per_aug, metas_all[i], iou_thr=getattr(det_cfg, "nms_iou_thr", 0.5)
            )
            detections.append(
                dict(boxes=fused["boxes"], scores=fused["scores"], labels=fused["labels"] + 1)
            )
        ann = dataset.get_ann_info(i)
        if segm:
            # gt masks stream to RLE too (the evaluator is RLE-native)
            ann = dict(
                ann,
                masks=[m if isinstance(m, dict) else rle_encode(np.asarray(m, np.uint8))
                       for m in ann.get("masks", [])],
                masks_ignore=[m if isinstance(m, dict) else rle_encode(np.asarray(m, np.uint8))
                              for m in ann.get("masks_ignore", [])],
            )
        annotations.append(ann)

    if voc_metric:
        out = eval_voc_map(detections, annotations, det_cfg.num_classes, use_07_metric=True)
    else:
        out = eval_coco_map(detections, annotations, det_cfg.num_classes)
    metrics = {k: v for k, v in out.items() if not isinstance(v, dict)}
    if segm:
        segm_out = eval_coco_segm_map(detections, annotations, det_cfg.num_classes)
        metrics.update(
            {f"segm_{k}": v for k, v in segm_out.items() if not isinstance(v, dict)}
        )
    if return_detections:
        return metrics, detections
    return metrics


def coco_detection_dump(dataset, detections) -> list:
    """Per-image detection dicts -> COCO results-format records.

    ``detections`` is the list `evaluate_detector(return_detections=True)`
    yields: per image, xyxy boxes in ORIGINAL image coordinates (inclusive
    +1 pixel convention) with 1-based dataset-space labels.  Records use the
    dataset's real COCO image ids and category ids (the inverse of
    ``cat2label``), so the json is submission-compatible — the reverse of
    ``bbox_parse`` (data/ops/bbox.py: x2 = x + w - 1).  Falls back to the
    dataset index / raw label for datasets without COCO metadata (VOC).
    """
    label2cat = None
    if hasattr(dataset, "cat2label"):
        label2cat = {v: k for k, v in dataset.cat2label.items()}
    records = []
    for idx, det in enumerate(detections):
        if hasattr(dataset, "img_infos"):
            img_id = dataset.img_infos[idx]["id"]
        else:
            img_id = idx
        for box, score, label in zip(det["boxes"], det["scores"], det["labels"]):
            x1, y1, x2, y2 = (float(v) for v in box[:4])
            label = int(label)
            records.append({
                "image_id": img_id,
                "category_id": label2cat.get(label, label) if label2cat else label,
                "bbox": [x1, y1, x2 - x1 + 1.0, y2 - y1 + 1.0],
                "score": float(score),
            })
    return records


def coco_segm_dump(dataset, detections) -> list:
    """Per-image detections with ``masks`` (RLE dicts as streamed by
    ``evaluate_detector(segm=True)``, or dense arrays) -> COCO segm results
    records.

    The json is pycocotools-submission-compatible ({"size", "counts"} with
    the compressed-counts string, via the native codec in
    ``data/ops/mask.py``).  Same id mapping as ``coco_detection_dump``.
    """
    from ..data.ops.mask import _rle_compress, rle_encode

    label2cat = None
    if hasattr(dataset, "cat2label"):
        label2cat = {v: k for k, v in dataset.cat2label.items()}
    records = []
    for idx, det in enumerate(detections):
        if hasattr(dataset, "img_infos"):
            img_id = dataset.img_infos[idx]["id"]
        else:
            img_id = idx
        for mask, score, label in zip(det["masks"], det["scores"], det["labels"]):
            label = int(label)
            rle = mask if isinstance(mask, dict) else rle_encode(np.asarray(mask, np.uint8))
            counts = rle["counts"]
            if not isinstance(counts, (bytes, str)):
                counts = _rle_compress(counts)
            if isinstance(counts, bytes):
                rle = dict(rle, counts=counts.decode("ascii"))
            records.append({
                "image_id": img_id,
                "category_id": label2cat.get(label, label) if label2cat else label,
                "segmentation": rle,
                "score": float(score),
            })
    return records


def make_validation_hook(
    model,
    det_cfg,
    dataset,
    batch: int = 8,
    canvas=None,
    max_images: Optional[int] = None,
    voc_metric: bool = False,
    segm: bool = False,
) -> Callable:
    """``hook(variables) -> metrics`` for Trainer's in-training validation.

    Builds the jitted inference program ONCE and reuses it every epoch.
    """
    infer = make_inference_fn(model, det_cfg, segm=segm)

    def hook(variables: Dict[str, Any]) -> Dict[str, float]:
        return evaluate_detector(
            model, det_cfg, variables, dataset,
            batch=batch, canvas=canvas, max_images=max_images,
            voc_metric=voc_metric, infer=infer, segm=segm,
        )

    return hook
