from .configuration_efficientnet import EfficientNetConfig
from .modeling_efficientnet import (
    EfficientNetForImageClassification,
    EfficientNetModel,
    EfficientNetModelStandalone,
)
from .image_processing_efficientnet import EfficientNetImageProcessor
