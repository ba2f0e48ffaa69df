from .configuration_mobilevit import MobileViTConfig
from .modeling_mobilevit import (
    MobileViTForImageClassification,
    MobileViTForSemanticSegmentation,
    MobileViTModelStandalone,
)
from .image_processing_mobilevit import MobileViTImageProcessor
