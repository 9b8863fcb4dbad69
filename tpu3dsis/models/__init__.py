from tpu3dsis.models.backbones import (
    BACKBONES,
    FEAT_STRIDE,
    MaskBackboneArch,
    ScanNetBackbone,
    SUNCGBackbone,
)
from tpu3dsis.models.detector import Detector, build_inference_fn
from tpu3dsis.models.rpn import RPNHeads, select_proposals

__all__ = [
    "BACKBONES",
    "FEAT_STRIDE",
    "MaskBackboneArch",
    "ScanNetBackbone",
    "SUNCGBackbone",
    "Detector",
    "build_inference_fn",
    "RPNHeads",
    "select_proposals",
]
