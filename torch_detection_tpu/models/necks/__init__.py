from .fpn import FPN, PAFPN
from .yolo_neck import YOLOV3Neck
from .ct_neck import CTResNetNeck
from .yolox_pafpn import YOLOXPAFPN

__all__ = ["FPN", "PAFPN", "YOLOV3Neck", "CTResNetNeck", "YOLOXPAFPN"]
