from .anchors import AnchorGenerator, base_anchors, grid_anchors, valid_flags
from .assign import (
    AssignResult,
    MaxIoUAssigner,
    PseudoSampler,
    RandomSampler,
    SampleResult,
)
from .boxes import bbox2delta, bbox_areas, bbox_overlaps, clip_boxes, delta2bbox
from .losses import (
    binary_cross_entropy,
    iou_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from .nms import NMSResult, multiclass_nms, multiclass_soft_nms, nms, soft_nms
from .tpu_gather import gather_rows, take_per_row

__all__ = [k for k in dir() if not k.startswith("_")]
