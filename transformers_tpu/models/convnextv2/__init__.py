from .configuration_convnextv2 import ConvNextV2Config
from .modeling_convnextv2 import (
    ConvNextV2ForImageClassification,
    ConvNextV2Model,
    ConvNextV2ModelStandalone,
)
