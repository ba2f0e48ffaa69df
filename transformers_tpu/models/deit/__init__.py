from .configuration_deit import DeiTConfig
from .modeling_deit import (
    DeiTForImageClassification,
    DeiTForImageClassificationWithTeacher,
    DeiTModel,
    DeiTModelStandalone,
)
from .image_processing_deit import DeiTImageProcessor
