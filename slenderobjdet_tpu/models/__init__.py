"""Model zoo: registries + config-driven construction (the counterpart of
`slender_det/modeling/__init__.py` / detectron2 `build_model`)."""

from ..utils.registry import Registry
from .backbones.fpn import BACKBONE_REGISTRY, build_backbone

META_ARCH_REGISTRY = Registry("META_ARCH")
PROPOSAL_GENERATOR_REGISTRY = Registry("PROPOSAL_GENERATOR")
ROI_HEADS_REGISTRY = Registry("ROI_HEADS")
META_HEADS_REGISTRY = Registry("META_HEADS")


def build_model(cfg):
    """Build the detector named by cfg.MODEL.META_ARCHITECTURE."""
    return META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)(cfg)


from .meta_arch.fcos import FCOS  # noqa: E402

META_ARCH_REGISTRY.register(FCOS, name="FCOS")

__all__ = [
    "META_ARCH_REGISTRY",
    "PROPOSAL_GENERATOR_REGISTRY",
    "ROI_HEADS_REGISTRY",
    "META_HEADS_REGISTRY",
    "BACKBONE_REGISTRY",
    "build_backbone",
    "build_model",
]
