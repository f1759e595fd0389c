"""Config -> objects: build detector, detection config, datasets, optimizer.

The glue the reference left absent (no tools/, SURVEY.md §2 #33): one place
that turns the dict-config surface (configs/*.py) into the flax model, the
static RetinaNetConfig, loaders, and the optax optimizer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from .models.detectors import RetinaNetConfig, SingleStageDetector
from .ops.anchors import AnchorGenerator
from .ops.assign import MaxIoUAssigner
from .utils.registry import DETECTORS

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def build_detector(model_cfg: Dict[str, Any], compute_dtype: Optional[str] = None):
    cfg = {k: dict(v) if isinstance(v, dict) else v for k, v in dict(model_cfg).items()}
    if compute_dtype is not None:
        dtype = _DTYPES[compute_dtype]
        for key in ("backbone", "neck", "head", "rpn_head", "bbox_head",
                    "mask_head", "mask_feat_head"):
            if key in cfg and isinstance(cfg[key], dict):
                cfg[key].setdefault("dtype", dtype)
        if cfg.get("type") in ("DETR", "SparseRCNN"):
            # transformer/interaction compute dtype is top-level
            cfg.setdefault("dtype", dtype)
    return DETECTORS.build(cfg)


def _build_anchor_generator(anchor: Dict[str, Any], default_octave=4.0) -> AnchorGenerator:
    return AnchorGenerator(
        strides=tuple(anchor.get("strides", (8, 16, 32, 64, 128))),
        ratios=tuple(anchor.get("ratios", (0.5, 1.0, 2.0))),
        scales=tuple(anchor["scales"]) if "scales" in anchor else None,
        octave_base_scale=anchor.get(
            "octave_base_scale", None if "scales" in anchor else default_octave
        ),
        scales_per_octave=anchor.get("scales_per_octave", 3),
    )


def build_detection_cfg(det_cfg: Dict[str, Any]):
    """Build the static detection config: RetinaNetConfig (default) or
    FasterRCNNConfig when ``style='faster_rcnn'``."""
    cfg = dict(det_cfg)
    style = cfg.pop("style", "retina")
    anchor = dict(cfg.pop("anchor", {}))
    assigner = dict(cfg.pop("assigner", {}))

    if style in ("faster_rcnn", "mask_rcnn", "cascade_rcnn", "cascade_mask_rcnn"):
        from .models.detectors import (
            CascadeMaskRCNNConfig,
            CascadeRCNNConfig,
            FasterRCNNConfig,
            MaskRCNNConfig,
        )

        cls = {"faster_rcnn": FasterRCNNConfig, "mask_rcnn": MaskRCNNConfig,
               "cascade_rcnn": CascadeRCNNConfig,
               "cascade_mask_rcnn": CascadeMaskRCNNConfig}[style]
        kwargs: Dict[str, Any] = {}
        if anchor:
            kwargs["anchor_generator"] = _build_anchor_generator(anchor)
        keys = ["num_classes", "score_thr", "nms_iou_thr", "max_detections",
                "roi_size", "finest_scale", "rpn_num_samples",
                "rcnn_num_samples", "rcnn_pos_fraction", "smooth_l1_beta",
                "approx_top_k"]
        if style in ("mask_rcnn", "cascade_mask_rcnn"):
            keys += ["mask_size", "mask_roi_size", "mask_loss_weight"]
        if style in ("cascade_rcnn", "cascade_mask_rcnn"):
            keys += ["num_stages", "stage_pos_ious", "stage_loss_weights"]
        for key in keys:
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        if style in ("cascade_rcnn", "cascade_mask_rcnn") and "stage_target_stds" in cfg:
            kwargs["stage_target_stds"] = tuple(
                tuple(s) for s in cfg["stage_target_stds"]
            )
        return cls(**kwargs)

    if style == "fast_rcnn":
        from .models.detectors import FastRCNNConfig
        from .ops.assign import MaxIoUAssigner as _Assigner

        kwargs = {}
        if assigner:
            kwargs["rcnn_assigner"] = _Assigner(**assigner)
        for key in ("num_classes", "roi_size", "finest_scale",
                    "rcnn_num_samples", "rcnn_pos_fraction", "smooth_l1_beta",
                    "score_thr", "nms_iou_thr", "max_detections",
                    "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return FastRCNNConfig(**kwargs)

    if style == "fcos":
        from .models.detectors import FCOSConfig

        kwargs = {}
        for key in ("num_classes", "strides", "regress_ranges", "focal_gamma",
                    "focal_alpha", "score_thr", "nms_iou_thr",
                    "pre_select_per_level", "pre_nms_top_k", "max_detections",
                    "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                if key == "regress_ranges":
                    v = tuple(tuple(r) for r in v)
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return FCOSConfig(**kwargs)

    if style == "fovea":
        from .models.detectors import FoveaConfig

        kwargs = {}
        for key in ("num_classes", "strides", "base_edges", "scale_ranges",
                    "sigma", "focal_gamma", "focal_alpha", "smooth_l1_beta",
                    "reg_loss_weight", "score_thr", "nms_iou_thr",
                    "pre_select_per_level", "pre_nms_top_k", "max_detections",
                    "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                if key == "scale_ranges":
                    v = tuple(tuple(r) for r in v)
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return FoveaConfig(**kwargs)

    if style == "atss":
        from .models.detectors import ATSSConfig
        from .ops.assign import ATSSAssigner

        kwargs = {}
        if anchor:
            kwargs["anchor_generator"] = _build_anchor_generator(anchor)
        if assigner:
            kwargs["assigner"] = ATSSAssigner(**assigner)
        for key in ("num_classes", "target_means", "target_stds", "focal_gamma",
                    "focal_alpha", "reg_loss_weight", "score_thr", "nms_iou_thr",
                    "pre_select_per_level", "pre_nms_top_k", "max_detections",
                    "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return ATSSConfig(**kwargs)

    if style == "paa":
        from .models.detectors import PAAConfig
        from .ops.assign import MaxIoUAssigner

        kwargs = {}
        if anchor:
            kwargs["anchor_generator"] = _build_anchor_generator(anchor)
        if assigner:
            # _base_ deep-merge can leave foreign assigner keys behind
            # (e.g. ATSS's topk when a PAA config inherits the ATSS file);
            # keep only MaxIoUAssigner's fields
            fields = ("pos_iou_thr", "neg_iou_thr", "min_pos_iou",
                      "gt_max_assign_all", "ignore_iof_thr")
            kwargs["assigner"] = MaxIoUAssigner(
                **{k: v for k, v in assigner.items() if k in fields}
            )
        for key in ("num_classes", "target_means", "target_stds", "topk",
                    "gmm_iters", "focal_gamma", "focal_alpha",
                    "reg_loss_weight", "iou_loss_weight", "score_thr",
                    "nms_iou_thr", "pre_select_per_level", "pre_nms_top_k",
                    "max_detections", "score_voting", "voting_sigma",
                    "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return PAAConfig(**kwargs)

    if style == "sparse_rcnn":
        from .models.detectors import SparseRCNNConfig

        kwargs = {}
        for key in ("num_classes", "num_proposals", "cls_weight", "l1_weight",
                    "giou_weight", "focal_gamma", "focal_alpha", "score_thr",
                    "max_detections"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return SparseRCNNConfig(**kwargs)

    if style == "detr":
        from .models.detectors import DETRConfig

        kwargs = {}
        for key in ("num_classes", "num_queries", "cls_weight", "bbox_weight",
                    "giou_weight", "eos_coef", "aux_loss", "score_thr",
                    "max_detections"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return DETRConfig(**kwargs)

    if style == "gfl":
        from .models.detectors import GFLConfig
        from .ops.assign import ATSSAssigner

        kwargs = {}
        if anchor:
            kwargs["anchor_generator"] = _build_anchor_generator(anchor)
        if assigner:
            kwargs["assigner"] = ATSSAssigner(**assigner)
        for key in ("num_classes", "reg_max", "qfl_beta", "qfl_weight",
                    "dfl_weight", "giou_weight", "score_thr", "nms_iou_thr",
                    "pre_select_per_level", "pre_nms_top_k", "max_detections",
                    "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return GFLConfig(**kwargs)

    if style == "yolo":
        from .models.detectors import YOLOV3Config
        from .ops.anchors import YOLOAnchorGenerator
        from .ops.assign import GridAssigner

        kwargs = {}
        if anchor:
            kwargs["anchor_generator"] = YOLOAnchorGenerator(
                strides=tuple(anchor["strides"]),
                base_sizes=tuple(
                    tuple(tuple(p) for p in lvl) for lvl in anchor["base_sizes"]
                ),
            )
        if assigner:
            kwargs["assigner"] = GridAssigner(**assigner)
        for key in ("num_classes", "loss_xy_weight", "loss_wh_weight",
                    "loss_conf_weight", "loss_cls_weight", "conf_thr",
                    "score_thr", "nms_iou_thr", "pre_select_per_level",
                    "pre_nms_top_k", "max_detections", "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return YOLOV3Config(**kwargs)

    if style == "yolox":
        from .models.detectors import YOLOXConfig

        kwargs = {}
        for key in ("num_classes", "strides", "center_radius", "candidate_topk",
                    "iou_cost_weight", "reg_loss_weight", "use_l1", "score_thr",
                    "nms_iou_thr", "pre_nms_top_k", "max_detections",
                    "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return YOLOXConfig(**kwargs)

    if style == "solov2":
        from .models.detectors import SOLOV2Config

        kwargs = {}
        for key in ("num_classes", "grid_numbers", "scale_ranges", "sigma",
                    "mask_stride", "focal_gamma", "focal_alpha", "dice_weight",
                    "max_pos_cells", "score_thr", "update_thr", "mask_thr",
                    "pre_nms_top_k", "max_detections", "nms_method",
                    "nms_sigma", "mask_out_size", "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                if key == "scale_ranges":
                    v = tuple(tuple(r) for r in v)
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return SOLOV2Config(**kwargs)

    if style == "centernet":
        from .models.detectors import CenterNetConfig

        kwargs = {}
        for key in ("num_classes", "down_ratio", "min_overlap", "heat_weight",
                    "wh_weight", "off_weight", "score_thr", "max_detections",
                    "nms_iou_thr"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return CenterNetConfig(**kwargs)

    if style == "ssd":
        from .models.detectors import SSDConfig
        from .ops.anchors import SSDAnchorGenerator

        kwargs = {}
        if anchor:
            kwargs["anchor_generator"] = SSDAnchorGenerator(
                strides=tuple(anchor["strides"]),
                min_sizes=tuple(anchor["min_sizes"]),
                max_sizes=tuple(anchor["max_sizes"]),
                ratios=tuple(tuple(r) for r in anchor["ratios"]),
            )
        if assigner:
            kwargs["assigner"] = MaxIoUAssigner(**assigner)
        for key in ("num_classes", "target_means", "target_stds", "neg_pos_ratio",
                    "smooth_l1_beta", "score_thr", "nms_iou_thr",
                    "pre_nms_top_k", "max_detections", "approx_top_k"):
            if key in cfg:
                v = cfg[key]
                kwargs[key] = tuple(v) if isinstance(v, list) else v
        return SSDConfig(**kwargs)

    kwargs = {}
    if anchor:
        kwargs["anchor_generator"] = _build_anchor_generator(anchor)
    if assigner:
        kwargs["assigner"] = MaxIoUAssigner(**assigner)
    keys = [
        "num_classes", "target_means", "target_stds", "focal_gamma", "focal_alpha",
        "smooth_l1_beta", "reg_loss_weight", "score_thr", "nms_iou_thr",
        "pre_select_per_level", "pre_nms_top_k", "max_detections",
        "approx_top_k", "nms_method", "soft_sigma",
    ]
    if style == "free_anchor":
        keys += ["pre_anchor_topk", "bbox_thr", "bag_gamma", "bag_alpha",
                 "loc_loss_weight"]
    for key in keys:
        if key in cfg:
            v = cfg[key]
            kwargs[key] = tuple(v) if isinstance(v, list) else v
    if style == "free_anchor":
        from .models.detectors import FreeAnchorConfig

        return FreeAnchorConfig(**kwargs)
    return RetinaNetConfig(**kwargs)


def init_detector_variables(model, det_cfg, model_cfg, sample_image, seed: int = 0):
    """Init flax variables for any detector family.

    Two-stage detectors run their roi (and mask) heads through separate
    apply-methods, so ``model.init`` on the image alone never visits those
    submodules; this helper inits every method and merges the param trees.
    ``model_cfg`` is the model config dict (neck out_channels sizes the roi
    feature placeholder).
    """
    import jax

    from .models.detectors import CascadeRCNN, FastRCNN, MaskRCNN, TwoStageDetector

    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), sample_image)
    if isinstance(model, FastRCNN):
        feat_ch = model_cfg["neck"]["out_channels"]
        roi_size = getattr(det_cfg, "roi_size", 7)
        vars2 = model.init(
            jax.random.PRNGKey(seed + 1),
            jnp.zeros((1, 8, roi_size, roi_size, feat_ch), jnp.float32),
            method=FastRCNN.roi_forward,
        )
        return {
            "params": {**variables["params"], **dict(vars2["params"])},
            "batch_stats": variables.get("batch_stats", {}),
        }
    if not isinstance(model, TwoStageDetector):
        return variables

    feat_ch = model_cfg["neck"]["out_channels"]
    roi_size = getattr(det_cfg, "roi_size", 7)
    roi_method = (
        CascadeRCNN.roi_forward_all
        if isinstance(model, CascadeRCNN)
        else TwoStageDetector.roi_forward
    )
    vars2 = model.init(
        jax.random.PRNGKey(seed + 1),
        jnp.zeros((1, 8, roi_size, roi_size, feat_ch), jnp.float32),
        method=roi_method,
    )
    extra_params = dict(vars2["params"])
    from .models.detectors import CascadeMaskRCNN

    if isinstance(model, CascadeMaskRCNN):
        mask_roi = getattr(det_cfg, "mask_roi_size", 14)
        vars3 = model.init(
            jax.random.PRNGKey(seed + 2),
            jnp.zeros((1, 8, mask_roi, mask_roi, feat_ch), jnp.float32),
            method=CascadeMaskRCNN.mask_forward_all,
        )
        extra_params.update(vars3["params"])
    elif isinstance(model, MaskRCNN):
        mask_roi = getattr(det_cfg, "mask_roi_size", 14)
        vars3 = model.init(
            jax.random.PRNGKey(seed + 2),
            jnp.zeros((1, 8, mask_roi, mask_roi, feat_ch), jnp.float32),
            method=MaskRCNN.mask_forward,
        )
        extra_params.update(vars3["params"])
    return {
        "params": {**variables["params"], **extra_params},
        "batch_stats": variables.get("batch_stats", {}),
    }


def build_loss_fn(model, det_cfg, rng_seed: int = 0):
    """Return ``loss_fn(params, batch_stats, batch) -> (loss, metrics)`` for
    the detector family implied by ``det_cfg``."""
    import jax

    from .models.detectors import (
        CascadeMaskRCNNConfig,
        CascadeRCNNConfig,
        FasterRCNNConfig,
        MaskRCNNConfig,
        TwoStageDetector,
        cascade_mask_rcnn_loss,
        cascade_rcnn_loss,
        faster_rcnn_loss,
        mask_rcnn_loss,
        retina_loss,
    )

    def _step_rng(step):
        # fold the (traced) step counter into the seed so RPN/RCNN positive
        # capping and negative sampling draw a fresh stream every step;
        # a fixed PRNGKey here would freeze the sampling pattern for the run
        return jax.random.fold_in(jax.random.PRNGKey(rng_seed), step)

    if isinstance(det_cfg, CascadeMaskRCNNConfig):
        def loss_fn(params, batch_stats, batch, step=0):
            variables = {"params": params, "batch_stats": batch_stats}
            losses = cascade_mask_rcnn_loss(
                det_cfg, model, variables, batch, _step_rng(step)
            )
            aux = {k: v for k, v in losses.items() if k != "loss"}
            return losses["loss"], aux

        return loss_fn

    if isinstance(det_cfg, CascadeRCNNConfig):
        def loss_fn(params, batch_stats, batch, step=0):
            variables = {"params": params, "batch_stats": batch_stats}
            losses = cascade_rcnn_loss(det_cfg, model, variables, batch, _step_rng(step))
            aux = {k: v for k, v in losses.items() if k != "loss"}
            return losses["loss"], aux

        return loss_fn

    if isinstance(det_cfg, MaskRCNNConfig):
        def loss_fn(params, batch_stats, batch, step=0):
            variables = {"params": params, "batch_stats": batch_stats}
            losses = mask_rcnn_loss(det_cfg, model, variables, batch, _step_rng(step))
            aux = {k: v for k, v in losses.items() if k != "loss"}
            return losses["loss"], aux

        return loss_fn

    if isinstance(det_cfg, FasterRCNNConfig):
        def loss_fn(params, batch_stats, batch, step=0):
            variables = {"params": params, "batch_stats": batch_stats}
            losses = faster_rcnn_loss(det_cfg, model, variables, batch, _step_rng(step))
            aux = {k: v for k, v in losses.items() if k != "loss"}
            return losses["loss"], aux

        return loss_fn

    from .models.detectors import FastRCNNConfig, fast_rcnn_loss

    if isinstance(det_cfg, FastRCNNConfig):
        def loss_fn(params, batch_stats, batch, step=0):
            variables = {"params": params, "batch_stats": batch_stats}
            losses = fast_rcnn_loss(det_cfg, model, variables, batch, _step_rng(step))
            aux = {k: v for k, v in losses.items() if k != "loss"}
            return losses["loss"], aux

        return loss_fn

    from .models.detectors import (
        ATSSConfig,
        FCOSConfig,
        SSDConfig,
        YOLOV3Config,
        atss_loss,
        fcos_loss,
        ssd_loss,
        yolo_loss,
    )

    if isinstance(det_cfg, YOLOV3Config):
        def loss_fn(params, batch_stats, batch):
            pred_maps = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = yolo_loss(
                det_cfg, pred_maps, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], img_shapes=batch.get("img_shape"),
            )
            return losses["loss"], {
                "loss_xy": losses["loss_xy"],
                "loss_wh": losses["loss_wh"],
                "loss_conf": losses["loss_conf"],
                "loss_cls": losses["loss_cls"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import YOLOXConfig, yolox_loss

    if isinstance(det_cfg, YOLOXConfig):
        def loss_fn(params, batch_stats, batch):
            cls, reg, obj = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = yolox_loss(
                det_cfg, cls, reg, obj, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"],
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_reg": losses["loss_reg"],
                "loss_obj": losses["loss_obj"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import SOLOV2Config, solov2_loss

    if isinstance(det_cfg, SOLOV2Config):
        def loss_fn(params, batch_stats, batch):
            cls, kern, mfeat = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = solov2_loss(
                det_cfg, cls, kern, mfeat, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], batch["gt_masks"],
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_mask": losses["loss_mask"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import CenterNetConfig, centernet_loss

    if isinstance(det_cfg, CenterNetConfig):
        def loss_fn(params, batch_stats, batch):
            heat, wh, off = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = centernet_loss(
                det_cfg, heat, wh, off, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"],
            )
            return losses["loss"], {
                "loss_heatmap": losses["loss_heatmap"],
                "loss_wh": losses["loss_wh"],
                "loss_offset": losses["loss_offset"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import DETRConfig, detr_loss

    if isinstance(det_cfg, DETRConfig):
        def loss_fn(params, batch_stats, batch):
            img = batch["image"]
            shapes = batch.get("img_shape")
            if shapes is None:
                shapes = jnp.broadcast_to(
                    jnp.asarray(img.shape[1:3], jnp.float32), (img.shape[0], 2)
                )
            cls, box = model.apply(
                {"params": params, "batch_stats": batch_stats}, img,
                img_shapes=shapes.astype(jnp.float32), train=True,
            )
            losses = detr_loss(
                det_cfg, cls, box, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], img_shapes=shapes.astype(jnp.float32),
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_l1": losses["loss_l1"],
                "loss_giou": losses["loss_giou"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import SparseRCNNConfig, sparse_rcnn_loss

    if isinstance(det_cfg, SparseRCNNConfig):
        def loss_fn(params, batch_stats, batch):
            img = batch["image"]
            shapes = batch.get("img_shape")
            if shapes is None:
                shapes = jnp.broadcast_to(
                    jnp.asarray(img.shape[1:3], jnp.float32), (img.shape[0], 2)
                )
            cls, box = model.apply(
                {"params": params, "batch_stats": batch_stats}, img,
                img_shapes=shapes.astype(jnp.float32), train=True,
            )
            losses = sparse_rcnn_loss(
                det_cfg, cls, box, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], img_shapes=shapes.astype(jnp.float32),
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_l1": losses["loss_l1"],
                "loss_giou": losses["loss_giou"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import GFLConfig, gfl_loss

    if isinstance(det_cfg, GFLConfig):
        def loss_fn(params, batch_stats, batch):
            cls, reg = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = gfl_loss(
                det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], img_shapes=batch.get("img_shape"),
            )
            return losses["loss"], {
                "loss_qfl": losses["loss_qfl"],
                "loss_giou": losses["loss_giou"],
                "loss_dfl": losses["loss_dfl"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    if isinstance(det_cfg, ATSSConfig):
        def loss_fn(params, batch_stats, batch):
            cls, reg, ctr = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = atss_loss(
                det_cfg, cls, reg, ctr, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], img_shapes=batch.get("img_shape"),
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_reg": losses["loss_reg"],
                "loss_centerness": losses["loss_centerness"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import PAAConfig, paa_loss

    if isinstance(det_cfg, PAAConfig):
        def loss_fn(params, batch_stats, batch):
            cls, reg, iou_p = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = paa_loss(
                det_cfg, cls, reg, iou_p, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"], img_shapes=batch.get("img_shape"),
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_reg": losses["loss_reg"],
                "loss_iou": losses["loss_iou"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import FoveaConfig, fovea_loss

    if isinstance(det_cfg, FoveaConfig):
        def loss_fn(params, batch_stats, batch):
            cls, reg = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = fovea_loss(
                det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"],
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_reg": losses["loss_reg"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    if isinstance(det_cfg, FCOSConfig):
        def loss_fn(params, batch_stats, batch):
            cls, reg, ctr = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = fcos_loss(
                det_cfg, cls, reg, ctr, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"],
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_reg": losses["loss_reg"],
                "loss_centerness": losses["loss_centerness"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    if isinstance(det_cfg, SSDConfig):
        def loss_fn(params, batch_stats, batch):
            cls, reg = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = ssd_loss(
                det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"],
            )
            return losses["loss"], {
                "loss_cls": losses["loss_cls"],
                "loss_reg": losses["loss_reg"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    from .models.detectors import FreeAnchorConfig, free_anchor_loss

    if isinstance(det_cfg, FreeAnchorConfig):
        def loss_fn(params, batch_stats, batch):
            cls, reg = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
            )
            losses = free_anchor_loss(
                det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
                batch["gt_valid"],
            )
            return losses["loss"], {
                "loss_pos": losses["loss_pos"],
                "loss_neg": losses["loss_neg"],
                "num_pos": losses["num_pos"],
            }

        return loss_fn

    def loss_fn(params, batch_stats, batch):
        cls, reg = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch["image"], train=True
        )
        losses = retina_loss(
            det_cfg, cls, reg, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shapes=batch.get("img_shape"),
        )
        return losses["loss"], {
            "loss_cls": losses["loss_cls"],
            "loss_reg": losses["loss_reg"],
            "num_pos": losses["num_pos"],
        }

    return loss_fn


def build_lr_schedule(cfg, steps_per_epoch: int):
    """The config's LR schedule as a plain ``step -> lr`` callable.

    Deterministic from (cfg, steps_per_epoch) so the Trainer can re-derive
    the current lr for metrics without threading the closure through
    ``build_train_objects``'s return value.
    """
    from .engine.trainer import detection_lr_schedule

    opt_cfg = cfg.get("optimizer", {})
    sched_cfg = cfg.get("schedule", {})
    return detection_lr_schedule(
        opt_cfg.get("lr", 0.01),
        steps_per_epoch=max(int(steps_per_epoch), 1),
        total_epochs=sched_cfg.get("total_epochs", 12),
        decay_epochs=tuple(sched_cfg.get("decay_epochs", (8, 11))),
        warmup_steps=sched_cfg.get("warmup_steps", 500),
        warmup_ratio=sched_cfg.get("warmup_ratio", 1.0 / 3),
        policy=sched_cfg.get("policy", "step"),
        min_lr_ratio=sched_cfg.get("min_lr_ratio", 0.0),
    )


def build_train_objects(cfg, data_parallel: int = 1) -> Tuple[Any, RetinaNetConfig, Any, Any]:
    """(model, det_cfg, train_loader, tx) from a full config tree.

    ``data_parallel`` = size of the mesh's data axis on this host; the host
    batch is ``sample_per_replica * data_parallel`` so every data shard gets
    ``sample_per_replica`` images.
    """
    import jax

    from .data import build_dataloader, get_datasets
    from .parallel import make_optimizer

    runtime = cfg.get("runtime", {})
    model = build_detector(cfg["model"], runtime.get("compute_dtype"))
    det_cfg = build_detection_cfg(cfg["detection"])

    data_cfg = cfg["data"]
    dataset = get_datasets(dict(data_cfg["train"]))
    loader = build_dataloader(
        dataset,
        sample_per_replica=data_cfg.get("sample_per_replica", 2) * data_parallel,
        dist=jax.process_count() > 1,
        max_gts=data_cfg.get("max_gts", 100),
        canvas=tuple(data_cfg["canvas"]) if data_cfg.get("canvas") else None,
        size_divisor=data_cfg["train"].get("size_divisor", 32) or 32,
        workers=int(data_cfg.get("workers_per_host", 0)),
        # Fast R-CNN: fixed proposal slate so one XLA program serves every batch
        max_proposals=data_cfg.get("max_proposals"),
        # stem_s2d backbones take the space-to-depth wire straight from the
        # loader (host-side relayout is free; on-device it is not)
        s2d=bool(cfg["model"].get("backbone", {}).get("stem_s2d", False)),
    )

    opt_cfg = cfg.get("optimizer", {})
    schedule = build_lr_schedule(cfg, max(len(loader), 1))
    tx = make_optimizer(
        learning_rate=schedule,
        momentum=opt_cfg.get("momentum", 0.9),
        weight_decay=opt_cfg.get("weight_decay", 1e-4),
        grad_clip_norm=opt_cfg.get("grad_clip_norm"),
        kind=opt_cfg.get("type", "sgd"),
    )
    return model, det_cfg, loader, tx
