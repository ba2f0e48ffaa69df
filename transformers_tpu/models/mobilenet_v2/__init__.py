from .configuration_mobilenet_v2 import MobileNetV2Config
from .modeling_mobilenet_v2 import (
    MobileNetV2ForImageClassification,
    MobileNetV2Model,
    MobileNetV2ModelStandalone,
)
from .image_processing_mobilenet_v2 import MobileNetV1ImageProcessor, MobileNetV2ImageProcessor
