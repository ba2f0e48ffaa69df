from .modeling_vitpose import (
    VitPoseConfig,
    VitPoseForPoseEstimation,
)
