from .single_stage import (
    RetinaNetConfig,
    SingleStageDetector,
    decode_detections,
    retina_loss,
)
from .two_stage import (
    FasterRCNNConfig,
    TwoStageDetector,
    faster_rcnn_inference,
    faster_rcnn_loss,
)
from .free_anchor import FreeAnchorConfig, free_anchor_loss
from .fcos import FCOSConfig, decode_fcos, fcos_loss
from .foveabox import FoveaConfig, decode_fovea, fovea_loss
from .atss import ATSSConfig, atss_loss, decode_atss
from .paa import PAAConfig, decode_paa, paa_loss, paa_reassign
from .gfl import GFLConfig, decode_gfl, gfl_loss, integral
from .detr import DETR, DETRConfig, decode_detr, detr_loss
from .ssd import SSDConfig, decode_ssd, ssd_loss
from .yolov3 import YOLOV3Config, decode_yolo, yolo_loss
from .yolox import YOLOXConfig, decode_yolox, simota_assign, yolox_loss
from .centernet import (
    CenterNetConfig,
    centernet_loss,
    centernet_targets,
    decode_centernet,
)
from .solov2 import (
    SOLOV2,
    SOLOV2Config,
    decode_solov2,
    solov2_loss,
    solov2_targets,
)
from .sparse_rcnn import (
    SparseRCNN,
    SparseRCNNConfig,
    decode_sparse_rcnn,
    sparse_rcnn_loss,
)
from .fast_rcnn import (
    FastRCNN,
    FastRCNNConfig,
    fast_rcnn_inference,
    fast_rcnn_loss,
)
from .cascade_mask_rcnn import (
    CascadeMaskRCNN,
    CascadeMaskRCNNConfig,
    cascade_mask_rcnn_inference,
    cascade_mask_rcnn_loss,
)
from .cascade_rcnn import (
    CascadeRCNN,
    CascadeRCNNConfig,
    cascade_rcnn_inference,
    cascade_rcnn_loss,
)
from .mask_rcnn import (
    MaskDetections,
    MaskRCNN,
    MaskRCNNConfig,
    mask_rcnn_inference,
    mask_rcnn_loss,
)

__all__ = [
    "YOLOXConfig",
    "decode_yolox",
    "simota_assign",
    "yolox_loss",
    "RetinaNetConfig",
    "SingleStageDetector",
    "SOLOV2",
    "SOLOV2Config",
    "decode_solov2",
    "solov2_loss",
    "solov2_targets",
    "SparseRCNN",
    "SparseRCNNConfig",
    "decode_sparse_rcnn",
    "sparse_rcnn_loss",
    "decode_detections",
    "retina_loss",
    "FreeAnchorConfig",
    "free_anchor_loss",
    "FasterRCNNConfig",
    "FastRCNN",
    "FastRCNNConfig",
    "fast_rcnn_inference",
    "fast_rcnn_loss",
    "CascadeMaskRCNN",
    "CascadeMaskRCNNConfig",
    "cascade_mask_rcnn_inference",
    "cascade_mask_rcnn_loss",
    "CascadeRCNN",
    "CascadeRCNNConfig",
    "cascade_rcnn_inference",
    "cascade_rcnn_loss",
    "MaskDetections",
    "MaskRCNN",
    "MaskRCNNConfig",
    "mask_rcnn_inference",
    "mask_rcnn_loss",
    "TwoStageDetector",
    "faster_rcnn_inference",
    "faster_rcnn_loss",
    "SSDConfig",
    "decode_ssd",
    "ssd_loss",
    "FCOSConfig",
    "decode_fcos",
    "fcos_loss",
    "FoveaConfig",
    "decode_fovea",
    "fovea_loss",
    "ATSSConfig",
    "atss_loss",
    "decode_atss",
    "PAAConfig",
    "paa_loss",
    "decode_paa",
    "paa_reassign",
    "GFLConfig",
    "decode_gfl",
    "gfl_loss",
    "integral",
    "DETR",
    "DETRConfig",
    "decode_detr",
    "detr_loss",
    "CenterNetConfig",
    "centernet_loss",
    "centernet_targets",
    "decode_centernet",
    "YOLOV3Config",
    "decode_yolo",
    "yolo_loss",
]
