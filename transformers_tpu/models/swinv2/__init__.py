from .configuration_swinv2 import Swinv2Config
from .modeling_swinv2 import (
    Swinv2ForImageClassification,
    Swinv2ModelStandalone,
)
