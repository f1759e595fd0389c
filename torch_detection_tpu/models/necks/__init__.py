from .fpn import FPN, PAFPN
from .yolo_neck import YOLOV3Neck

__all__ = ["FPN", "PAFPN", "YOLOV3Neck"]
