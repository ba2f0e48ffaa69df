from .configuration_convnext import ConvNextConfig
from .modeling_convnext import (
    ConvNextForImageClassification,
    ConvNextModel,
    ConvNextModelStandalone,
)
