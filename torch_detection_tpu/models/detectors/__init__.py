from .single_stage import (
    RetinaNetConfig,
    SingleStageDetector,
    decode_detections,
    retina_loss,
)

__all__ = [
    "RetinaNetConfig",
    "SingleStageDetector",
    "decode_detections",
    "retina_loss",
]
