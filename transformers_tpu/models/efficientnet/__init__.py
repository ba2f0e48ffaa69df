from .configuration_efficientnet import EfficientNetConfig
from .modeling_efficientnet import (
    EfficientNetForImageClassification,
    EfficientNetModel,
    EfficientNetModelStandalone,
)
