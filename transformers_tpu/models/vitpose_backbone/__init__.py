from .modeling_vitpose_backbone import (
    VitPoseBackbone,
    VitPoseBackboneConfig,
    VitPoseBackboneStandalone,
)
