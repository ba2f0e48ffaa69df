from .configuration_swin import SwinConfig
from .modeling_swin import (
    SwinForImageClassification,
    SwinModel,
    SwinModelStandalone,
)
