from .resnet import ResNet, ResNeXt, SEResNet, SEResNeXt

__all__ = ["ResNet", "ResNeXt", "SEResNet", "SEResNeXt"]
