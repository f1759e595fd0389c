"""Mask R-CNN: Faster R-CNN + FCN mask branch.

Assembles the pieces built across the framework (TwoStageDetector two-stage
box path, ``models/heads/mask_head.py`` mask head + on-device RoIAlign mask
targets) into the full instance-segmentation detector the reference's mask
plumbing (``datasets/utils/mask.py``, ``dataset_transforms.py:69-98``)
pointed toward but never reached.

Everything stays fixed-shape: mask targets are cropped on-device from the
padded (B, max_gts, H, W) gt-mask tensor at the sampled positive rois; at
inference the mask branch runs on the (B, max_detections) padded detection
slate and pasting happens per image with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.roi_align import batched_multilevel_roi_align
from ...utils.registry import DETECTORS, HEADS
from ..heads.mask_head import mask_loss, mask_targets_for_rois
from .two_stage import (
    FasterRCNNConfig,
    TwoStageDetector,
    _faster_rcnn_loss_core,
    _sample_fixed,
    faster_rcnn_inference,
)


@DETECTORS.register_module
class MaskRCNN(TwoStageDetector):
    """TwoStageDetector + mask head (config key ``mask_head``)."""

    mask_head: Optional[Dict[str, Any]] = None

    def setup(self):
        super().setup()
        assert self.mask_head is not None, "MaskRCNN requires a mask_head cfg"
        self.mask_mod = HEADS.build(dict(self.mask_head), name="mask_head")

    def mask_forward(self, roi_feats: jax.Array, train: bool = False) -> jax.Array:
        return self.mask_mod(roi_feats, train=train)


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig(FasterRCNNConfig):
    mask_size: int = 28  # head outputs 2x the roi feature size (14 -> 28)
    mask_roi_size: int = 14
    mask_loss_weight: float = 1.0
    # mask branch trains on positives only; the box sampler caps positives at
    # rcnn_pos_fraction * rcnn_num_samples (mmdet convention: 0.25*512 = 128),
    # so a larger mask slate only adds repeated rois.  None -> that cap.
    mask_num_rois: Optional[int] = None


def mask_rcnn_loss(
    cfg: MaskRCNNConfig,
    model: MaskRCNN,
    variables: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    train: bool = True,
) -> Dict[str, jax.Array]:
    """Box losses (shared with Faster R-CNN) + the mask branch loss.

    Requires ``batch['gt_masks']`` (B, G, H, W) uint8 from the collate mask
    path.  The mask branch samples its own positive rois (reusing the rcnn
    assigner on proposals+gt) so the box and mask batches stay fixed-shape.
    """
    # share ONE traced forward with the box tier: re-applying the model here
    # is forward-CSE'd by XLA but makes JAX emit a second, independent
    # backbone+FPN backward for the mask cotangents (+26 ms of the b4 train
    # step, measured round-4 — see _faster_rcnn_loss_core's docstring)
    losses, feats, proposals = _faster_rcnn_loss_core(
        cfg, model, variables, batch, rng, train=train
    )

    gt_boxes = batch["gt_boxes"]
    gt_labels = batch["gt_labels"]
    gt_valid = batch["gt_valid"]
    gt_masks = batch["gt_masks"]
    b = gt_boxes.shape[0]
    rngs = jax.random.split(rng, b)

    def sample_pos_rois(i):
        cand = jnp.concatenate([proposals.boxes[i], gt_boxes[i]], axis=0)
        cand_valid = jnp.concatenate([proposals.valid[i], gt_valid[i]], axis=0)
        assign = cfg.rcnn_assigner(
            cand, gt_boxes[i], gt_valid[i], gt_labels[i], anchor_valid=cand_valid
        )
        pos = assign.assigned_gt_inds > 0
        neg = assign.assigned_gt_inds == 0
        # positives only, sized to the box sampler's positive cap (see
        # MaskRCNNConfig.mask_num_rois) — r3: 256 -> 128 rois cut the b4
        # train step 230 -> 190 ms with identical effective mask batch
        num = cfg.mask_num_rois or max(
            int(cfg.rcnn_num_samples * cfg.rcnn_pos_fraction), 1
        )
        idx, is_pos, _ = _sample_fixed(rngs[i], pos, neg, num, pos_fraction=1.0)
        rois = cand[idx]
        labels = jnp.where(is_pos, assign.labels[idx], 0)
        matched = jnp.clip(assign.assigned_gt_inds[idx] - 1, 0, gt_boxes.shape[1] - 1)
        targets = mask_targets_for_rois(gt_masks[i], rois, matched, cfg.mask_size)
        return rois, labels, targets, is_pos

    rois, roi_labels, targets, roi_pos = jax.vmap(sample_pos_rois)(jnp.arange(b))

    roi_feats = batched_multilevel_roi_align(
        list(feats[: len(cfg.roi_strides)]),  # native dtype; einsums accumulate f32
        rois, cfg.roi_strides, cfg.mask_roi_size, finest_scale=cfg.finest_scale,
    )
    mask_logits = model.apply(
        variables, roi_feats, train=train, method=MaskRCNN.mask_forward
    )
    loss_mask = mask_loss(mask_logits, targets, roi_labels, roi_pos) * cfg.mask_loss_weight
    losses = dict(losses)
    losses["loss_mask"] = loss_mask
    losses["loss"] = losses["loss"] + loss_mask
    return losses


class MaskDetections(NamedTuple):
    boxes: jnp.ndarray  # (B, D, 4)
    scores: jnp.ndarray  # (B, D)
    labels: jnp.ndarray  # (B, D)
    valid: jnp.ndarray  # (B, D)
    mask_probs: jnp.ndarray  # (B, D, M, M) sigmoid probs for the det class


def mask_rcnn_inference(
    cfg: MaskRCNNConfig,
    model: MaskRCNN,
    variables: Dict,
    images: jax.Array,
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> MaskDetections:
    """Box inference + mask branch on the final detections.

    Returns per-detection (M, M) mask probabilities; use
    ``models.heads.paste_masks`` to raster them onto the image.
    """
    dets = faster_rcnn_inference(cfg, model, variables, images, img_shapes, scale_factors)
    # mask rois are in the network frame; detections were rescaled to the
    # original frame when scale_factors was given — undo for feature lookup
    roi_boxes = dets.boxes
    if scale_factors is not None:
        roi_boxes = roi_boxes * scale_factors[:, None, None]

    feats, _, _ = model.apply(variables, images)
    roi_feats = batched_multilevel_roi_align(
        list(feats[: len(cfg.roi_strides)]),  # native dtype; einsums accumulate f32
        roi_boxes, cfg.roi_strides, cfg.mask_roi_size, finest_scale=cfg.finest_scale,
    )
    mask_logits = model.apply(variables, roi_feats, method=MaskRCNN.mask_forward)
    num_classes = mask_logits.shape[-1]
    safe_cls = jnp.clip(dets.labels, 0, num_classes - 1)
    logits = jnp.take_along_axis(
        mask_logits, safe_cls[..., None, None, None], axis=-1
    )[..., 0]
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    probs = probs * dets.valid[..., None, None]
    return MaskDetections(dets.boxes, dets.scores, dets.labels, dets.valid, probs)
