from .anchor_head import RetinaHead, flatten_head_outputs
from .bbox_head import BBoxHead
from .fcos_head import FCOSHead
from .fovea_head import FoveaHead
from .atss_head import ATSSHead, PAAHead
from .gfl_head import GFLHead
from .ssd_head import SSDHead
from .yolo_head import YOLOV3Head
from .centernet_head import CenterNetHead
from .rpn_head import ProposalConfig, Proposals, RPNHead, generate_proposals

__all__ = [
    "YOLOV3Head",
    "CenterNetHead",
    "RetinaHead",
    "ATSSHead",
    "PAAHead",
    "FoveaHead",
    "GFLHead",
    "flatten_head_outputs",
    "BBoxHead",
    "ProposalConfig",
    "Proposals",
    "RPNHead",
    "generate_proposals",
]

from .mask_head import (  # noqa: E402
    FCNMaskHead, mask_loss, mask_targets_for_rois, paste_masks, paste_masks_np,
)

__all__ += ["FCNMaskHead", "mask_loss", "mask_targets_for_rois", "paste_masks", "paste_masks_np"]
from .solov2_head import MaskFeatHead, SOLOV2Head  # noqa: E402

__all__ += ["MaskFeatHead", "SOLOV2Head"]
from .yolox_head import YOLOXHead  # noqa: E402

__all__ += ["YOLOXHead"]
