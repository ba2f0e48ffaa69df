from .configuration_regnet import RegNetConfig
from .modeling_regnet import (
    RegNetForImageClassification,
    RegNetModel,
    RegNetModelStandalone,
)
