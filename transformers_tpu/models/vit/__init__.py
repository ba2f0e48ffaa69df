from .configuration_vit import ViTConfig
from .modeling_vit import (
    ViTForImageClassification,
    ViTModel,
    ViTModelStandalone,
    ViTPreTrainedModel,
)
from .image_processing_vit import ViTImageProcessor
