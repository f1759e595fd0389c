from .csp_darknet import CSPDarknet
from .darknet import Darknet
from .mobilenet import MobileNet, MobileNetV2
from .resnet import ResNet, ResNeXt, SEResNet, SEResNeXt
from .shufflenet import ShuffleNet, ShuffleNetV2
from .ssd_vgg import SSDVGG
from .vgg import VGG

__all__ = [
    "CSPDarknet",
    "Darknet",
    "MobileNet",
    "MobileNetV2",
    "ResNet",
    "ResNeXt",
    "SEResNet",
    "SEResNeXt",
    "ShuffleNet",
    "ShuffleNetV2",
    "VGG",
    "SSDVGG",
]
