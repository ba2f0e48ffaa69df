from .configuration_dinov2 import Dinov2Config
from .modeling_dinov2 import (
    Dinov2ForImageClassification,
    Dinov2Model,
    Dinov2ModelStandalone,
)
