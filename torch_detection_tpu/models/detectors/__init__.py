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

__all__ = [
    "RetinaNetConfig",
    "SingleStageDetector",
    "decode_detections",
    "retina_loss",
    "FasterRCNNConfig",
    "TwoStageDetector",
    "faster_rcnn_inference",
    "faster_rcnn_loss",
]
