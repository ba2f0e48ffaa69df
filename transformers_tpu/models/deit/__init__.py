from .configuration_deit import DeiTConfig
from .modeling_deit import (
    DeiTForImageClassification,
    DeiTForImageClassificationWithTeacher,
    DeiTModel,
    DeiTModelStandalone,
)
