from .modeling_mobilenet_v1 import (
    MobileNetV1Config,
    MobileNetV1ForImageClassification,
    MobileNetV1Model,
    MobileNetV1ModelStandalone,
)
