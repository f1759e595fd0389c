"""Cascade Mask R-CNN: Cascade R-CNN + per-stage FCN mask heads.

Cai & Vasconcelos, TPAMI 2019 (the instance-segmentation extension of the
cascade).  Completes the mask side of the multi-stage story the reference's
mask plumbing (``datasets/utils/mask.py``, ``dataset_transforms.py:69-98``)
pointed toward: each cascade stage carries its own mask head trained on that
stage's progressively-refined positive rois, and inference averages the
stage heads' sigmoid masks on the final refined boxes (the mmdet
``CascadeRoIHead`` convention).

TPU design (everything fixed-shape, one jitted program):
* the mask tier rides ``_cascade_rcnn_loss_core``'s traced forward and its
  per-stage sampled slates — re-applying the model here would duplicate the
  backbone+FPN backward (the round-4 Mask R-CNN lesson); threading feats
  keeps one backward.
* ``_sample_fixed`` orders each stage slate positives-first, so the mask
  tier is a static ``[:, :mask_num_rois]`` prefix slice: no re-assignment,
  no extra sampling rng, and every positive roi (the box sampler caps them
  at ``rcnn_pos_fraction * rcnn_num_samples``) is retained.
* mask targets come from the channels-leading pyramid-routed extractor
  (``mask_targets_for_rois``), matched-channel only.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...ops.roi_align import batched_multilevel_roi_align
from ...utils.registry import DETECTORS, HEADS
from ..heads.mask_head import mask_loss, mask_targets_for_rois
from .cascade_rcnn import (
    CascadeRCNN,
    CascadeRCNNConfig,
    _cascade_rcnn_loss_core,
    cascade_rcnn_inference,
)
from .mask_rcnn import MaskDetections


@DETECTORS.register_module
class CascadeMaskRCNN(CascadeRCNN):
    """CascadeRCNN + ``num_stages`` mask heads (config key ``mask_head``)."""

    mask_head: Optional[Dict[str, Any]] = None

    def setup(self):
        super().setup()
        assert self.mask_head is not None, "CascadeMaskRCNN requires a mask_head cfg"
        self.mask_mods = [
            HEADS.build(dict(self.mask_head), name=f"mask_head{t}")
            for t in range(self.num_stages)
        ]

    def mask_forward(self, roi_feats: jax.Array, stage: int, train: bool = False):
        return self.mask_mods[stage](roi_feats, train=train)

    def mask_forward_all(self, roi_feats: jax.Array, train: bool = False):
        """Run every stage mask head once (parameter initialization helper)."""
        return [
            self.mask_forward(roi_feats, t, train=train)
            for t in range(self.num_stages)
        ]


@dataclasses.dataclass(frozen=True)
class CascadeMaskRCNNConfig(CascadeRCNNConfig):
    mask_size: int = 28  # head outputs 2x the roi feature size (14 -> 28)
    mask_roi_size: int = 14
    mask_loss_weight: float = 1.0
    # per-stage mask slate size; None -> the box sampler's positive cap
    # (mmdet convention: 0.25 * 512 = 128) — see MaskRCNNConfig.mask_num_rois
    mask_num_rois: Optional[int] = None


def cascade_mask_rcnn_loss(
    cfg: CascadeMaskRCNNConfig,
    model: CascadeMaskRCNN,
    variables: Dict,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    train: bool = True,
) -> Dict[str, jax.Array]:
    """Cascade box losses + one mask loss per stage, one pure fn.

    Requires ``batch['gt_masks']`` (B, G, H, W) uint8 from the collate mask
    path.  Stage t's mask head trains on the positives-first prefix of stage
    t's sampled box slate, weighted by ``stage_loss_weights[t]`` like the
    box losses (mmdet parity).
    """
    losses, feats, stage_slates = _cascade_rcnn_loss_core(
        cfg, model, variables, batch, rng, train=train
    )
    gt_masks = batch["gt_masks"]
    mask_num = cfg.mask_num_rois or max(
        int(cfg.rcnn_num_samples * cfg.rcnn_pos_fraction), 1
    )
    roi_levels = list(feats[: len(cfg.roi_strides)])

    losses = dict(losses)
    total = losses["loss"]
    for t, slate in enumerate(stage_slates):
        rois = slate["rois"][:, :mask_num]
        labels = slate["labels"][:, :mask_num]
        pos = slate["is_pos"][:, :mask_num]
        matched = slate["matched_gt"][:, :mask_num]
        targets = jax.vmap(
            lambda m, r, g: mask_targets_for_rois(m, r, g, cfg.mask_size)
        )(gt_masks, rois, matched)
        roi_feats = batched_multilevel_roi_align(
            roi_levels, rois, cfg.roi_strides, cfg.mask_roi_size,
            finest_scale=cfg.finest_scale,
        )
        mask_logits = model.apply(
            variables, roi_feats, t, train=train,
            method=CascadeMaskRCNN.mask_forward,
        )
        # stored unweighted like the box terms; the total applies the
        # per-stage weight (and mask_loss_weight)
        lm = mask_loss(mask_logits, targets, labels, pos)
        losses[f"loss_s{t}_mask"] = lm
        total = total + cfg.stage_loss_weights[t] * cfg.mask_loss_weight * lm
    losses["loss"] = total
    return losses


def cascade_mask_rcnn_inference(
    cfg: CascadeMaskRCNNConfig,
    model: CascadeMaskRCNN,
    variables: Dict,
    images: jax.Array,
    img_shapes: Optional[jax.Array] = None,
    scale_factors: Optional[jax.Array] = None,
) -> MaskDetections:
    """Cascade box inference + stage-averaged mask probs on final boxes.

    All ``num_stages`` mask heads run on the SAME final refined roi slate
    (one shared RoIAlign) and their per-class sigmoid probabilities are
    averaged — the mmdet Cascade Mask R-CNN test-time formulation.
    """
    dets = cascade_rcnn_inference(
        cfg, model, variables, images, img_shapes, scale_factors
    )
    # detections were rescaled to the original frame when scale_factors was
    # given; mask rois must be in the network frame for feature lookup
    roi_boxes = dets.boxes
    if scale_factors is not None:
        roi_boxes = roi_boxes * scale_factors[:, None, None]

    # re-apply is forward-CSE'd by XLA inside the same jit (inference has no
    # backward, so the round-4 duplicated-backward rule does not apply here)
    feats, _, _ = model.apply(variables, images)
    roi_feats = batched_multilevel_roi_align(
        list(feats[: len(cfg.roi_strides)]),
        roi_boxes, cfg.roi_strides, cfg.mask_roi_size,
        finest_scale=cfg.finest_scale,
    )
    probs_sum = 0.0
    for t in range(cfg.num_stages):
        mask_logits = model.apply(
            variables, roi_feats, t, method=CascadeMaskRCNN.mask_forward
        )
        num_classes = mask_logits.shape[-1]
        safe_cls = jnp.clip(dets.labels, 0, num_classes - 1)
        logits = jnp.take_along_axis(
            mask_logits, safe_cls[..., None, None, None], axis=-1
        )[..., 0]
        probs_sum = probs_sum + jax.nn.sigmoid(logits.astype(jnp.float32))
    probs = (probs_sum / cfg.num_stages) * dets.valid[..., None, None]
    return MaskDetections(dets.boxes, dets.scores, dets.labels, dets.valid, probs)
