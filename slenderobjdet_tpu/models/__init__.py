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
    if getattr(cfg.TPU, "INT8_SCALES", ""):
        # make the calibrated activation scales (tools/int8_calibrate.py)
        # ambient for every predict harness (trainer eval, bench tools,
        # serving export) — overridable per-call via
        # ops.quant.static_scales_scope
        from ..ops.quant import load_json_scales, set_default_scales

        set_default_scales(load_json_scales(cfg.TPU.INT8_SCALES))
    return META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)(cfg)


from .meta_arch.ablation import AblationMetaArch  # noqa: E402
from .meta_arch.fcos import FCOS, FCOSTopK, FCOSV3  # noqa: E402
from .meta_arch.rcnn import ProposalVisibleRCNN  # noqa: E402
from .meta_arch.reppoints import RepPointsDetector  # noqa: E402
from .meta_arch.retinanet import DeformableConvRetinaNet, RetinaNet  # noqa: E402

META_ARCH_REGISTRY.register(FCOS, name="FCOS")
# FCOSV2 is the reference's refactor of FCOS with identical training loss and
# topk-then-NMS inference (fcosv2.py:104-249) — exactly the structure this
# implementation already uses, so they share one class.
META_ARCH_REGISTRY.register(FCOS, name="FCOSV2")


def _fcos_with_anchor(cfg):
    """Diagnosis variant attaching each detection's implicit anchor — the
    source location as an (x,y,x,y) box — to outputs (fcoswa.py:68-76)."""
    det = FCOS(cfg)
    det.with_anchor = True
    return det


META_ARCH_REGISTRY.register(_fcos_with_anchor, name="FCOSWithAnchor")
META_ARCH_REGISTRY.register(FCOSTopK, name="FCOSTopK")
META_ARCH_REGISTRY.register(FCOSV3, name="FCOSV3")
# GroupNet (group/groupnet.py:23-384, not imported upstream) is FCOS with a
# "GroupHead" that is line-for-line the FCOSHead (it even constructs via
# super(FCOSHead, ...)); one implementation serves both names.
META_ARCH_REGISTRY.register(FCOS, name="GroupNet")

from .meta_arch.fcos_anchor import FCOSAnchor  # noqa: E402

META_ARCH_REGISTRY.register(FCOSAnchor, name="FCOSAnchor")

from .meta_arch.proposal_network import ProposalNetworkWithMasks  # noqa: E402
from .proposal_generator.ppg import PointsProposalGenerator  # noqa: E402
from .proposal_generator.rpg import RepPointsGenerator  # noqa: E402
from .proposal_generator.rpn import RPN  # noqa: E402


def _build_pnwm(cfg):
    """ProposalNetworkWithMasks dispatches on the configured proposal
    generator (the reference pnwm.py:46 calls self.proposal_generator built
    from MODEL.PROPOSAL_GENERATOR.NAME): PointsProposalGenerator /
    RepPointsGenerator are standalone proposal-only detectors here."""
    name = cfg.MODEL.PROPOSAL_GENERATOR.NAME
    if name == "PointsProposalGenerator":
        return PointsProposalGenerator(cfg)
    if name == "RepPointsGenerator":
        return RepPointsGenerator(cfg)
    return ProposalNetworkWithMasks(cfg)


META_ARCH_REGISTRY.register(_build_pnwm, name="ProposalNetworkWithMasks")
META_ARCH_REGISTRY.register(_build_pnwm, name="ProposalNetwork")
# RPN variants: one implementation with a pluggable matcher covers the
# reference's RPN / RPNWNM / RPNWithAnchor (proposal_generator/rpn.py:25-356)
PROPOSAL_GENERATOR_REGISTRY.register(RPN, name="RPN")
PROPOSAL_GENERATOR_REGISTRY.register(RPN, name="RPNWNM")
PROPOSAL_GENERATOR_REGISTRY.register(RPN, name="RPNWithAnchor")
PROPOSAL_GENERATOR_REGISTRY.register(PointsProposalGenerator,
                                     name="PointsProposalGenerator")
PROPOSAL_GENERATOR_REGISTRY.register(RepPointsGenerator,
                                     name="RepPointsGenerator")
META_ARCH_REGISTRY.register(RetinaNet, name="RetinaNet")
# diagnosis variant carrying each detection's matched anchor through
# topk/NMS into outputs (reference retinanetwa.py:88-154)
META_ARCH_REGISTRY.register(
    lambda cfg: RetinaNet(cfg, with_anchor=True), name="RetinaNetWithAnchor"
)
META_ARCH_REGISTRY.register(DeformableConvRetinaNet, name="DeformableConvRetinaNet")
from .meta_arch.retinanet import CenternessRetinaNet, NearestRetinaNet  # noqa: E402
META_ARCH_REGISTRY.register(CenternessRetinaNet, name="CenternessRetinaNet")
META_ARCH_REGISTRY.register(NearestRetinaNet, name="NearestRetinaNet")
META_ARCH_REGISTRY.register(ProposalVisibleRCNN, name="ProposalVisibleRCNN")
META_ARCH_REGISTRY.register(ProposalVisibleRCNN, name="GeneralizedRCNN")
# WithAnchor variant: RPN keeps each proposal's source anchor through
# topk/NMS (find_top_rpn_proposals_anchors, proposal_utils.py:11-130) and
# the ROI heads thread (anchor, proposal) pairs into final detections
# (FastRCNNOutputLayersWithAnchor, fast_rcnn.py:109-115)
META_ARCH_REGISTRY.register(
    lambda cfg: ProposalVisibleRCNN(cfg, with_anchor=True),
    name="ProposalVisibleRCNNWithAnchor",
)
META_ARCH_REGISTRY.register(RepPointsDetector, name="RepPointsDetector")
META_ARCH_REGISTRY.register(AblationMetaArch, name="AblationMetaArch")

from .meta_arch.hybrids import (  # noqa: E402
    FCOSNCRetinaNet,
    FCOSRepPoints,
    FCOSRetinaNet,
    PointRetinaNet,
    RepPointsCenterness,
    RepPointsV2,
    ReppointsRetinaNet,
)

META_ARCH_REGISTRY.register(RepPointsCenterness, name="RepPointsCenterness")
META_ARCH_REGISTRY.register(RepPointsV2, name="RepPointsV2")
META_ARCH_REGISTRY.register(FCOSRetinaNet, name="FCOSRetinaNet")
META_ARCH_REGISTRY.register(FCOSNCRetinaNet, name="FCOSNCRetinaNet")
META_ARCH_REGISTRY.register(PointRetinaNet, name="PointRetinaNet")
META_ARCH_REGISTRY.register(FCOSRepPoints, name="FCOSRepPoints")
META_ARCH_REGISTRY.register(ReppointsRetinaNet, name="ReppointsRetinaNet")

from .meta_arch.retina_rotated import RotatedRetinaNet  # noqa: E402

META_ARCH_REGISTRY.register(RotatedRetinaNet, name="RotatedRetinaNet")

from .meta_arch.corner_net import CornerNet  # noqa: E402

META_ARCH_REGISTRY.register(CornerNet, name="CornerNet")

from .backbones.hourglass import build_hourglass_backbone  # noqa: E402

BACKBONE_REGISTRY.register(build_hourglass_backbone, name="build_hourglass_backbone")

from .backbones import vt_fpn  # noqa: E402,F401  (registers PVT/VT-FPN builders)

# The ablation chassis (reference meta/meta.py METAARCH_REGISTRY +
# meta/heads/* MEAT_HEADS_REGISTRY) dispatches heads by cfg.MODEL.META_ARCH
# .NAME inside AblationMetaArch; this registry records the available head
# names for discoverability/validation. Values are the head names themselves
# (the implementations live in meta_arch/ablation.py, not separate classes).
for _head in ("LRTBHead", "LRTBTopkHead", "PointSetHead", "AnchorHead"):
    META_HEADS_REGISTRY.register(_head, name=_head)

__all__ = [
    "META_ARCH_REGISTRY",
    "PROPOSAL_GENERATOR_REGISTRY",
    "ROI_HEADS_REGISTRY",
    "META_HEADS_REGISTRY",
    "BACKBONE_REGISTRY",
    "build_backbone",
    "build_model",
]
