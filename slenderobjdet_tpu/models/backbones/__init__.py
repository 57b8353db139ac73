from .fpn import BACKBONE_REGISTRY, build_backbone
from .resnet import ResNet, resnet_from_cfg

__all__ = ["BACKBONE_REGISTRY", "build_backbone", "ResNet", "resnet_from_cfg"]
