from .checkpoint import (MODELZOO_URLS, latest_checkpoint, load_checkpoint,
                         load_checkpoint_file, rebuild_opt_state,
                         resolve_checkpoint_source, save_checkpoint)
from .export import export_serving, load_serving, make_serving_fn, save_serving
from .eval import detections_from_nms, eval_coco_map, eval_voc_map
from .profiling import ThroughputMeter, annotate, trace
from .trainer import Trainer, detection_lr_schedule
from .tta import debox_to_original, merge_tta_detections
from .validate import (
    coco_detection_dump,
    coco_segm_dump,
    evaluate_detector,
    make_inference_fn,
    make_validation_hook,
)

__all__ = [
    "latest_checkpoint",
    "load_checkpoint",
    "load_checkpoint_file",
    "rebuild_opt_state",
    "resolve_checkpoint_source",
    "MODELZOO_URLS",
    "save_checkpoint",
    "coco_detection_dump",
    "coco_segm_dump",
    "evaluate_detector",
    "make_inference_fn",
    "make_validation_hook",
    "detections_from_nms",
    "eval_coco_map",
    "eval_voc_map",
    "ThroughputMeter",
    "annotate",
    "trace",
    "Trainer",
    "detection_lr_schedule",
    "debox_to_original",
    "merge_tta_detections",
]

from .eval import eval_coco_segm_map, mask_iou_matrix  # noqa: E402

__all__ += ["eval_coco_segm_map", "mask_iou_matrix"]
